"""Hardware-scaling control experiment for BASELINE.md.

Measures pure-Python multiprocessing regex throughput (no Ray) at several
process counts on this machine. Used to separate ENGINE scaling efficiency
from the sandbox host's frequency scaling / CPU steal: if the control shows
per-process throughput dropping from N to 4N busy cores, that loss applies
to ANY parallel software on this box and is not Ray/engine overhead.

Run: python tools/cpu_control.py
"""

import re
import time
from multiprocessing import Pool

RX = re.compile(
    r"\b([A-Z][A-Za-z0-9_-]*) (treats|affects|causes|interacts with|is part of"
    r"|is expressed in) ([A-Z][A-Za-z0-9_-]*)\b"
)
TEXTS = ["we observed Ent123 treats Ent456 in the study." for _ in range(20000)]


def work(n_iter: int) -> int:
    c = 0
    for _ in range(n_iter):
        for t in TEXTS:
            c += len(RX.findall(t))
    return c


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main():
    for n in (4, 8, 16, 32):
        iters = max(1, 1200 // n)
        with Pool(n) as p:
            s0 = steal_jiffies()
            t0 = time.perf_counter()
            p.map(work, [iters] * n)
            dt = time.perf_counter() - t0
            s1 = steal_jiffies()
        total = n * iters * len(TEXTS)
        print(
            f"procs={n:2d}: {dt:6.2f}s  {total/dt/1e6:6.2f}M texts/s  "
            f"per-proc {total/dt/n/1e6:.3f}M/s  steal_jiffies={s1-s0}"
        )


if __name__ == "__main__":
    main()
