"""Host-side probe: total slot-stream size S*K for lane-aligned row
capacities K on the headline histogram (3D N=256, T=8, n=2^24, bench seed).

The binned engine's per-point work — Benes/ragged slot expansion, the
window kernels' masked lanes, and the K-wide data DMAs — scales with the
padded slot count S*K, while rows S are bounded by the kernels'
SMEM-prefetch compile budget (~56k measured). _choose_K historically swept
powers of two only; Pallas needs only K % 128 == 0, so intermediate
capacities (384, 640, 768, 896) can fit the occupancy distribution much
tighter. Usage: python examples/probe_row_capacity.py [logn] [T]
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n, dim, N, m, sigma = 1 << logn, 3, 256, 2, 2.0
    M = int(round(sigma * N))
    rng = np.random.default_rng(7)  # bench.py seed
    pos = (rng.random((n, dim), dtype=np.float32) - 0.5) / 2.0

    # same binning math as ops/binned.py: shift = floor(pos*M) - m, bin by
    # tile of the WRAPPED shift
    nb = -(-M // T)
    ids = np.zeros(n, np.int64)
    for d in range(dim):
        s = (np.floor(pos[:, d] * M).astype(np.int64) - m) % M
        ids = ids * nb + s // T
    cnt = np.bincount(ids, minlength=nb**dim)
    cnt = cnt[cnt > 0].astype(np.int64)
    print(f"n={n} T={T}: occupied bins={cnt.size} mean={cnt.mean():.1f} "
          f"max={cnt.max()} min={cnt.min()}")

    for K in (256, 384, 512, 640, 768, 896, 1024):
        rows = int(np.sum(-(-cnt // K)))
        slots = rows * K
        print(f"  K={K:5d}: rows={rows:6d} slots={slots/1e6:7.2f}M "
              f"fill={n/slots*100:5.1f}% pad={(slots-n)/1e6:6.2f}M "
              f"{'(over 56k row budget)' if rows > 56000 else ''}")


if __name__ == "__main__":
    main()
