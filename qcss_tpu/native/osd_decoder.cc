// Batched OSD-0 (order-0 ordered-statistics) post-processor for the BP
// decoder's unconverged tail, host-native. The reference has no
// soft-decision decoding of any kind (its decoder is the emitted
// syndrome-table scan, reference: css_code.py:649-685); this kernel is the
// fast form of qcss_tpu/decode/bp.py::BPDecoder._osd0 and must stay
// BIT-IDENTICAL to it: sort columns most-suspect-first (ascending final
// LLR, ties broken by column index — a stable sort), GF(2)-eliminate the
// column-permuted augmented system to the first independent column set,
// read the solution off the syndrome column with every non-pivot variable
// at zero, and undo the permutation.
//
// The Python loop costs minutes per thousand shots on circuit-level Tanner
// graphs (n ~ 10^4 variables); this runs the same elimination on packed
// 64-bit rows in C++, threaded across shots.
//
// Layout: h [r, n] uint8 row-major (shared across the batch), synd [B, r]
// uint8, soft [B, n] float32 (BP's final LLR totals), out [B, n] uint8.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

namespace {

struct OsdProblem {
  const uint8_t* h;      // [r, n]
  const uint8_t* synd;   // [B, r]
  const float* soft;     // [B, n]
  uint8_t* out;          // [B, n]
  int32_t r, n;
  int64_t batch;
};

void decode_range(const OsdProblem& p, int64_t lo, int64_t hi) {
  const int32_t r = p.r, n = p.n;
  const int32_t words = (n + 1 + 63) / 64;  // + syndrome column
  std::vector<int32_t> order(n);
  std::vector<uint64_t> aug;             // [r, words]
  std::vector<int32_t> piv_rows, piv_cols;
  piv_rows.reserve(r);
  piv_cols.reserve(r);

  for (int64_t bi = lo; bi < hi; ++bi) {
    const float* soft = p.soft + bi * n;
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int32_t a, int32_t b) { return soft[a] < soft[b]; });

    // pack h[:, order] | synd into little-endian 64-bit words per row
    aug.assign((size_t)r * words, 0);
    for (int32_t row = 0; row < r; ++row) {
      const uint8_t* hrow = p.h + (size_t)row * n;
      uint64_t* arow = aug.data() + (size_t)row * words;
      for (int32_t c = 0; c < n; ++c) {
        if (hrow[order[c]]) arow[c >> 6] |= 1ull << (c & 63);
      }
      if (p.synd[bi * r + row]) arow[n >> 6] |= 1ull << (n & 63);
    }

    piv_rows.clear();
    piv_cols.clear();
    int32_t row = 0;
    for (int32_t c = 0; c < n && row < r; ++c) {
      const int32_t w = c >> 6;
      const uint64_t bit = 1ull << (c & 63);
      int32_t pr = -1;
      for (int32_t i = row; i < r; ++i) {
        if (aug[(size_t)i * words + w] & bit) {
          pr = i;
          break;
        }
      }
      if (pr < 0) continue;
      if (pr != row) {
        std::swap_ranges(aug.begin() + (size_t)row * words,
                         aug.begin() + (size_t)(row + 1) * words,
                         aug.begin() + (size_t)pr * words);
      }
      const uint64_t* prow = aug.data() + (size_t)row * words;
      for (int32_t i = 0; i < r; ++i) {
        if (i == row) continue;
        uint64_t* irow = aug.data() + (size_t)i * words;
        if (irow[w] & bit) {
          for (int32_t k = 0; k < words; ++k) irow[k] ^= prow[k];
        }
      }
      piv_rows.push_back(row);
      piv_cols.push_back(c);
      ++row;
    }

    uint8_t* out = p.out + bi * n;
    std::memset(out, 0, n);
    const int32_t sw = n >> 6;
    const uint64_t sbit = 1ull << (n & 63);
    for (size_t i = 0; i < piv_rows.size(); ++i) {
      if (aug[(size_t)piv_rows[i] * words + sw] & sbit) {
        out[order[piv_cols[i]]] = 1;
      }
    }
  }
}

}  // namespace

extern "C" int32_t qcss_osd0_batch(const uint8_t* h, int32_t r, int32_t n,
                                   const uint8_t* synd, const float* soft,
                                   int64_t batch, uint8_t* out,
                                   int32_t n_threads) {
  if (r <= 0 || n <= 0 || batch < 0) return 1;
  OsdProblem p{h, synd, soft, out, r, n, batch};
  if (n_threads < 1) n_threads = 1;
  if (n_threads == 1 || batch <= 1) {
    decode_range(p, 0, batch);
    return 0;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(batch, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([&p, lo, hi] { decode_range(p, lo, hi); });
  }
  for (auto& th : ts) th.join();
  return 0;
}
