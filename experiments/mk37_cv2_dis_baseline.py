"""mk37: the REFERENCE's flow engine measured — cv2 DISOpticalFlow
PRESET_FAST on the host CPU, 1080p + 540p gray pairs.

The reference's temporally-coherent video mode computes flow per frame on
CPU (/root/reference/pipeline.py:1906-1917: DISOpticalFlow_create(
PRESET_FAST), full-res or its own --flow_downscale). This is the number
BASELINE config #5 competes against; the reference assumed a 24-thread
host (docker-compose). cv2's DIS implementation DOES parallelize a call
over row stripes (setNumThreads), so the threads=1 and threads=N rows
below are distinct measurements — compare each against its own host
assumption rather than scaling one from the other.

Run anywhere (pure CPU, no relay needed):
    python experiments/mk37_cv2_dis_baseline.py
"""

import time

import numpy as np

import cv2


def bench(h, w, threads, reps=5):
    cv2.setNumThreads(threads)
    rng = np.random.default_rng(0)
    a = (rng.uniform(0, 255, (h, w))).astype(np.uint8)
    b = np.roll(a, 3, axis=1)
    b = np.clip(b.astype(np.int16) + rng.integers(-2, 3, (h, w)), 0, 255).astype(np.uint8)
    dis = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_FAST)
    dis.calc(a, b, None)  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        dis.calc(a, b, None)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n_host = cv2.getNumberOfCPUs()
    print(f"host CPUs: {n_host}")
    for h, w, label in [(1080, 1920, "1080p"), (540, 960, "540p-ds2")]:
        for threads in sorted({1, n_host}):
            t = bench(h, w, threads)
            print(f"[cv2 DIS PRESET_FAST {label} threads={threads}] "
                  f"{t * 1e3:.1f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
