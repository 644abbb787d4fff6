#!/usr/bin/env python3
"""Box-speed fingerprint: a fixed CPU-bound loop on every core, reported as
iterations/sec/core plus steal%. Bench wall-clock drifts 15-50% across days on
identical binaries (r11-r13 observation: 141.7 s -> 160 s -> 210 s full-surface
on the SAME code); this gives an engine-independent number to separate "the
box is slow today" from "a plan regressed". Reference points:

  2026-08-16 13:47 (r13, 210 s bench window):   med 1035, steal 1.5%
  2026-08-16 16:53 (r13, same box, hours later): med  898, steal 9.1%
    — the steal moved 1.5% -> 9.1% across the day at IDENTICAL specs: the
    drift is hypervisor co-tenancy, and it varies by the hour. Check steal
    FIRST; don't burn a bench attempt while it is elevated.
    (32 cores Xeon @ 2.10GHz nominal; r11's 141.7 s ledger day would
     presumably read materially higher med / near-zero steal.)

Usage: python3 tools/cpu_fingerprint.py
"""
import time
import multiprocessing as mp


def burn(q):
    t0 = time.time()
    n = 0
    while time.time() - t0 < 8:
        x = 0
        for i in range(100000):
            x += i * i
        n += 1
    q.put(n)


def read_stat():
    with open('/proc/stat') as f:
        return list(map(int, f.readline().split()[1:]))


def main():
    ncpu = mp.cpu_count()
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(ncpu)]
    a = read_stat()
    for p in ps:
        p.start()
    time.sleep(8)
    b = read_stat()
    for p in ps:
        p.join()
    d = [y - x for x, y in zip(a, b)]
    total = sum(d)
    names = ['user', 'nice', 'system', 'idle', 'iowait', 'irq', 'softirq', 'steal']
    pct = {n: round(100 * v / total, 2) for n, v in zip(names, d)}
    counts = sorted(q.get() for _ in ps)
    print({'cores': ncpu,
           'iters_per_8s_core': {'min': counts[0],
                                 'med': counts[len(counts) // 2],
                                 'max': counts[-1]},
           'cpu_pct': pct})


if __name__ == '__main__':
    main()
