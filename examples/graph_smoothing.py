"""Graph-signal smoothing with an NFFT-approximated Gaussian adjacency.

The reference's motivating workload (its README points at graph learning):
build a dense-graph adjacency from a Gaussian kernel over point positions
WITHOUT materializing the O(n^2) matrix, then run normalized-adjacency
propagation steps — each step is one fastsum matvec, O(m^d n + N^d log N).

Run on any backend:  python examples/graph_smoothing.py
"""

import os
import sys

# runnable from a source checkout without installing
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import torch_nfft_tpu as tn


def main():
    rng = np.random.default_rng(0)
    n, dim = 20000, 2

    # two noisy clusters + a noisy binary signal
    centers = np.array([[-0.6, -0.6], [0.6, 0.6]], np.float32)
    labels = rng.integers(0, 2, n)
    pos = centers[labels] + 0.25 * rng.standard_normal((n, dim)).astype(np.float32)
    signal = labels.astype(np.float32) + 0.8 * rng.standard_normal(n).astype(np.float32)

    # Gaussian kernel -> symmetric-normalized adjacency operator.
    kernel = tn.GaussianKernel(
        sigma=0.35, dim=dim, bandwidth=32, cutoff=4, max_euclidean_norm=1.5
    )
    adj = kernel.adjacency_matrix(pos, normalization="sym")

    smoothed = signal
    for _ in range(10):
        smoothed = np.asarray(adj @ smoothed)

    # Smoothing should separate the clusters far better than the raw signal.
    def separation(v):
        a, b = v[labels == 0], v[labels == 1]
        return abs(a.mean() - b.mean()) / (a.std() + b.std() + 1e-9)

    print(f"cluster separation raw:      {separation(signal):.2f}")
    print(f"cluster separation smoothed: {separation(smoothed):.2f}")
    assert separation(smoothed) > 3 * separation(signal)
    print("ok")


if __name__ == "__main__":
    main()
