#!/usr/bin/env python3
"""Audit: code-comment B-numbers must agree with SURVEY.md §2.

SURVEY §2's Part-B addenda table maps each B-number to its query name(s).
Query implementations carry a `// B<n>:` header comment directly above the
`"q_name" ->` entry. This script cross-references the two and exits non-zero
on any mismatch (the r7 verdict found one drift: a comment said B181 where
SURVEY numbers the operator B184).

Rules:
  - For every SURVEY row `| B<n> | ... | q_x[, q_y] | ... |`, if the nearest
    `// B<m>:`-style comment within the 40 lines above the query's definition
    names a DIFFERENT B-number that SURVEY assigns to ANOTHER query, flag it.
  - Comments that reference no B-number are fine (core B1-B17 and Part A rows
    are table-driven, not comment-driven).
  - A comment may legitimately mention several B-numbers (composed
    operators); it passes if ANY of them matches SURVEY's assignment.

Stdlib-only repo lint (no Spark, no third-party imports).
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SURVEY = os.path.join(ROOT, "SURVEY.md")
SRC = os.path.join(ROOT, "src", "main", "scala", "graft")


def survey_map():
    """B-number -> set of query names, and query name -> set of B-numbers."""
    b2q, q2b = {}, {}
    in_addenda = False
    for line in open(SURVEY, encoding="utf-8"):
        if line.startswith("**Part B addenda"):
            in_addenda = True
        if not in_addenda or not line.startswith("| B"):
            continue
        # Cells can't be split positionally: operator prose legitimately
        # contains literal pipes (`≤ k·|Q|` in B184's row). Take the row's
        # B-number from its first cell and collect EVERY q_* token in the row;
        # over-collection (a prose mention of a sibling query) only widens the
        # accepted set, which keeps this a zero-false-positive lint.
        m = re.match(r"\|\s*B(\d+)\s*\|", line)
        if not m:
            continue
        bnum = int(m.group(1))
        qnames = set(re.findall(r"q_\w+", line))
        b2q.setdefault(bnum, set()).update(qnames)
        for q in qnames:
            q2b.setdefault(q, set()).add(bnum)
    return b2q, q2b


def scala_files():
    for dirpath, _, names in os.walk(SRC):
        for n in names:
            if n.endswith(".scala"):
                yield os.path.join(dirpath, n)


def code_comment_bnums():
    """(site, query name, B-numbers tagged in the comment block above it)."""
    out = []
    qdef = re.compile(r'"(q_\w+)"\s*->')
    for path in scala_files():
        lines = open(path, encoding="utf-8").read().split("\n")
        for i, line in enumerate(lines):
            m = qdef.search(line)
            if not m:
                continue
            qname = m.group(1)
            nums = set()
            # Walk the contiguous comment block directly above the definition,
            # collecting only HEADER TAGS (`// B<n>: ...` — "this operator IS
            # B<n>"). Prose cross-references to other operators ("...what the
            # compaction operator (B72) exists for") are not claims about THIS
            # query's number and must not be flagged.
            j = i - 1
            while j >= 0 and lines[j].strip().startswith("//"):
                tag = re.match(r"//\s*B(\d+)\s*:", lines[j].strip())
                if tag:
                    nums.add(int(tag.group(1)))
                j -= 1
            if nums:
                # Per-SITE records (a query name appears twice — the queries
                # map and the oracle map; a drifted tag at either site must
                # not be masked by a correct tag at the other).
                out.append((f"{os.path.relpath(path, ROOT)}:{i + 1}", qname, nums))
    return out


def duplicate_query_keys():
    """Guard against silent Map-key shadowing: a `"q_x" ->` literal defined
    TWICE across the queries maps (or twice across the oracle maps) silently
    keeps only the last entry — round 9 nearly shipped a partition-evolution
    query invisibly shadowed by the same-named schema-evolution query. Each
    query name may appear at most once per kind (query-map vs oracle-map
    occurrences are told apart by what follows the arrow: oracle entries bind
    to a string literal, query entries to a function)."""
    qdefs, odefs = {}, {}
    qfile = re.compile(r'^\s{4}"(q_\w+)"\s*->')
    qmap = re.compile(r'\bval queries\b')
    omap = re.compile(r'\bval oracle\b')
    for dirpath, _, files in os.walk(os.path.join(SRC, "queries")):
        for fn in files:
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(dirpath, fn)
            ctx = None  # which top-level map the walker is inside
            for i, line in enumerate(open(path, encoding="utf-8"), 1):
                if qmap.search(line):
                    ctx = "query"
                elif omap.search(line):
                    ctx = "oracle"
                m = qfile.match(line)
                if not m or ctx is None:
                    continue
                # Top-level map entries are indented exactly 4 spaces; nested
                # `"q_x" ->` literals (helper maps inside a query body) are
                # deeper and skipped by the anchored regex.
                target = qdefs if ctx == "query" else odefs
                target.setdefault(m.group(1), []).append(f"{fn}:{i}")
    errs = []
    for kind, defs in (("query", qdefs), ("oracle", odefs)):
        for name, sites in sorted(defs.items()):
            if len(sites) > 1:
                errs.append(f"duplicate {kind} map key {name}: {sites} — "
                            "the later definition silently shadows the earlier")
    return errs


def main():
    b2q, q2b = survey_map()
    sites = code_comment_bnums()
    errors = duplicate_query_keys()
    for site, qname, nums in sorted(sites):
        if qname not in q2b:
            continue  # query not in the addenda table (core/Part-A row)
        expected = q2b[qname]
        if expected & nums:
            continue  # at least one tagged number matches SURVEY
        # Only flag numbers SURVEY assigns to a DIFFERENT query: a tag citing
        # a related operator family is fine when nothing contradicts.
        conflicting = {n for n in nums if n in b2q and qname not in b2q[n]}
        if conflicting:
            errors.append(
                f"{site} {qname}: tag names B{sorted(conflicting)} but SURVEY "
                f"assigns it B{sorted(expected)}")
    if errors:
        print("B-number drift between code comments and SURVEY.md §2:")
        for e in errors:
            print("  " + e)
        return 1
    print(f"OK: {len(sites)} tagged query sites checked against "
          f"{len(q2b)} SURVEY-addenda assignments, no drift")
    return 0


if __name__ == "__main__":
    sys.exit(main())
