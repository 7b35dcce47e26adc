#!/usr/bin/env python3
"""Standalone host-capacity probe (the graft.Bench effective_cores witness,
runnable WITHOUT starting a JVM/bench): times a fixed CPU kernel solo vs
all-cores-wide in separate processes and prints `n_cores * solo/wide`.

Use before recording a headline bench: BENCH walls drift +/-25% with the
VM host's effective parallel capacity (21-30 of 32 cores, invisible to
guest loadavg/steal — BASELINE.md's host-capacity-witness section). Only
record the round's artifact at >= ~28/32.

Usage: capacity_probe.py [iters]   (prints one float, e.g. "29.4")
"""
import multiprocessing as mp
import sys
import time


def burn(n):
    x = 1
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
    burn(iters // 10)  # warm
    t1 = time.perf_counter()
    burn(iters)
    solo = time.perf_counter() - t1
    n = mp.cpu_count()
    with mp.Pool(n) as pool:
        t2 = time.perf_counter()
        pool.map(burn, [iters] * n)
        wide = time.perf_counter() - t2
    print(f"{n * solo / wide:.1f}")


if __name__ == "__main__":
    main()
