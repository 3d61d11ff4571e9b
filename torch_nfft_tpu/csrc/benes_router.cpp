// Benes-network routing (the classic looping algorithm), C ABI for ctypes.
//
// Routes an arbitrary permutation of n = 2^q elements through the 2q-1
// stage Benes network (stage distances q-1..0..q-1). The swap decision of
// stage t's pair p is bit (p & 31) of out_bits[t*(n/64) + (p >> 5)] —
// per-PAIR bit packing, the minimal shippable representation (~n/2 bits
// per stage), expanded to per-element masks on the device (a reshape +
// broadcast; see torch_nfft_tpu/ops/pallas/benes.py:expand_pair_bits).
//
// The looping algorithm 2-colors the constraint cycles of each
// sub-permutation: an element and its input partner (i ^ h) must use
// different half-size subnetworks, as must the two elements sharing an
// output pair. Cycle-chasing is inherently sequential per subproblem
// (memory-latency-bound pointer chasing), but subproblems are
// independent; levels with many subproblems are split across threads.
// O(n log n) total work. NOTE: fusing the inverse-build and bit-emission
// into the chase was tried and measured 2.5x SLOWER at 2^25 — the extra
// random store streams contend with the latency-bound chain; keep the
// passes separate.
//
// This mirrors the role of the reference's CUDA atomics (its "router" is
// hardware, csrc/cuda/cuda_utils.cu:45-84); here the route is computed
// once per plan and applied at memory speed on the TPU.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Scratch {
  std::vector<int32_t> inv;
  std::vector<int8_t> subnet;
};

// Route one subproblem of size m at [base, base+m) within the padded
// space; P/Pn point at the local sub-permutation (values in [0, m)).
void route_level_one(const int32_t* P, int32_t* Pn, int64_t m, int64_t base,
                     int d, int64_t words_per_stage, int t_in, int t_out,
                     uint32_t* out_bits, Scratch& sc) {
  const int64_t h = m >> 1;
  int32_t* inv = sc.inv.data();
  int8_t* subnet = sc.subnet.data();
  for (int64_t i = 0; i < m; ++i) inv[P[i]] = (int32_t)i;
  std::memset(subnet, -1, (size_t)m);
  for (int64_t seed = 0; seed < m; ++seed) {
    if (subnet[seed] >= 0) continue;
    int64_t i = seed;
    // chase the constraint cycle, coloring i upper and i^h lower; the
    // element sharing the output pair with i^h continues the chain
    while (subnet[i] < 0) {
      subnet[i] = 0;
      subnet[i ^ h] = 1;
      i = inv[P[i ^ h] ^ h];
    }
  }
  // first pair id of this subproblem at stage distance d: pairs are
  // (base+j, base+j+h); base is a multiple of m = 2^(d+1)
  const int64_t pbase = (base >> (d + 1)) << d;
  uint32_t* win = out_bits + (int64_t)t_in * words_per_stage;
  uint32_t* wout = out_bits + (int64_t)t_out * words_per_stage;
  for (int64_t j = 0; j < h; ++j) {
    if (subnet[j] == 1) {
      const int64_t p = pbase + j;
      win[p >> 5] |= (1u << (p & 31));
    }
  }
  for (int64_t o = 0; o < h; ++o) {
    if (subnet[inv[o]] == 1) {
      const int64_t p = pbase + o;
      wout[p >> 5] |= (1u << (p & 31));
    }
  }
  const int64_t hm = h - 1;
  int32_t* U = Pn;
  int32_t* L = Pn + h;
  for (int64_t i = 0; i < m; ++i) {
    const int32_t tgt = (int32_t)(P[i] & hm);
    if (subnet[i] == 0)
      U[i & hm] = tgt;
    else
      L[i & hm] = tgt;
  }
}

}  // namespace

extern "C" {

// perm: (n,) int32 permutation of [0, n); n = 2^q.
// out_bits: (2q-1) * (n/64) uint32, ZEROED by the caller.
// n_threads: worker threads for levels with many subproblems (<=1: serial).
// Returns 0 on success, -1 on invalid input.
int32_t nfft_benes_route(const int32_t* perm, int64_t n, uint32_t* out_bits,
                         int32_t n_threads) {
  if (n < 2) return -1;
  int q = 0;
  while ((1LL << q) < n) ++q;
  if ((1LL << q) != n) return -1;
  const int64_t words_per_stage = n >> 6;

  std::vector<int32_t> pi(perm, perm + n), pnext(n);
  if (n_threads < 1) n_threads = 1;

  for (int l = 0;; ++l) {
    const int64_t m = n >> l;
    if (m == 2) {
      const int t = l;  // == q - 1, the middle stage (distance 1 pair)
      uint32_t* w = out_bits + (int64_t)t * words_per_stage;
      for (int64_t base = 0; base < n; base += 2) {
        if (pi[base] == 1) {
          const int64_t p = base >> 1;
          w[p >> 5] |= (1u << (p & 31));
        }
      }
      break;
    }
    const int d = q - 1 - l;
    const int t_in = l, t_out = 2 * q - 2 - l;
    const int64_t n_sub = n / m;
    // pair-bit words of distinct subproblems collide when h < 32; those
    // levels (and low-parallelism ones) run serial
    const bool can_thread =
        n_threads > 1 && n_sub >= 2 * n_threads && ((m >> 1) % 32 == 0);
    if (!can_thread) {
      Scratch sc{std::vector<int32_t>((size_t)m),
                 std::vector<int8_t>((size_t)m)};
      for (int64_t base = 0; base < n; base += m)
        route_level_one(pi.data() + base, pnext.data() + base, m, base, d,
                        words_per_stage, t_in, t_out, out_bits, sc);
    } else {
      std::vector<std::thread> ts;
      const int64_t per = (n_sub + n_threads - 1) / n_threads;
      for (int64_t w = 0; w < n_threads; ++w) {
        const int64_t lo = w * per, hi = std::min(n_sub, lo + per);
        if (lo >= hi) break;
        ts.emplace_back([&, lo, hi]() {
          Scratch sc{std::vector<int32_t>((size_t)m),
                     std::vector<int8_t>((size_t)m)};
          for (int64_t s = lo; s < hi; ++s) {
            const int64_t base = s * m;
            route_level_one(pi.data() + base, pnext.data() + base, m, base,
                            d, words_per_stage, t_in, t_out, out_bits, sc);
          }
        });
      }
      for (auto& t : ts) t.join();
    }
    std::swap(pi, pnext);
  }
  return 0;
}

}  // extern "C"
