// Native host runtime for sparsify.me-TPU. See capi.h.
//
// Selection semantics deliberately match sparsifyme_tpu/ops/prune.py's
// `_keep_topn_mask`: rank by (|value|, position) with later positions
// winning ties, keep the top-n ranks. This keeps the C++ host oracle and
// the JAX device path bit-identical on mask decisions.

#include "capi.h"

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

// Rank of element j within group a[0..m): number of elements strictly
// "less" under the (|a|, position) total order.
inline void keep_topn(const float* a, int m, int n, uint8_t* keep) {
  for (int j = 0; j < m; ++j) {
    int rank = 0;
    float aj = std::fabs(a[j]);
    for (int i = 0; i < m; ++i) {
      float ai = std::fabs(a[i]);
      if (ai < aj || (ai == aj && i < j)) ++rank;
    }
    keep[j] = rank >= m - n ? 1 : 0;
  }
}

}  // namespace

extern "C" {

int sm_abi_version(void) { return 1; }

double sm_now_ms(void) {
  auto t = std::chrono::steady_clock::now().time_since_epoch();
  return std::chrono::duration<double, std::milli>(t).count();
}

long sm_read_shapes(const char* path, int64_t* out, long max_rows) {
  std::ifstream f(path);
  if (!f.is_open()) return -1;
  std::string line;
  long rows = 0;
  bool first = true;
  // Column positions of m,n,k,b. Default: bare positional schema
  // (the reference contract, util/util.hxx:36-61). A named header row
  // (e.g. our datagen's "layer,m,n,k,b") overrides them.
  int cols[4] = {0, 1, 2, 3};
  while (std::getline(f, line) && rows < max_rows) {
    if (line.empty()) continue;
    std::stringstream ss(line);
    std::string cell;
    std::vector<std::string> cells;
    while (std::getline(ss, cell, ',')) {
      // Trim CR (python csv writes CRLF) and stray whitespace.
      while (!cell.empty() &&
             (cell.back() == '\r' || cell.back() == ' ' ||
              cell.back() == '\t')) {
        cell.pop_back();
      }
      std::size_t start = cell.find_first_not_of(" \t");
      cells.push_back(start == std::string::npos ? std::string()
                                                 : cell.substr(start));
    }
    if (first) {
      first = false;
      bool header = false;
      try {
        (void)std::stoll(cells.at(0));
      } catch (...) {
        header = true;
      }
      if (header) {
        const char* names[4] = {"m", "n", "k", "b"};
        for (int c = 0; c < 4; ++c) {
          for (std::size_t j = 0; j < cells.size(); ++j) {
            if (cells[j] == names[c]) cols[c] = static_cast<int>(j);
          }
        }
        continue;
      }
    }
    int64_t vals[4];
    bool ok = true;
    for (int c = 0; c < 4; ++c) {
      try {
        vals[c] = std::stoll(cells.at(cols[c]));
      } catch (...) {
        ok = false;
        break;
      }
    }
    if (!ok) continue;
    std::memcpy(out + rows * 4, vals, sizeof(vals));
    ++rows;
  }
  return rows;
}

void sm_prune_nm_f32(const float* w, int64_t rows, int64_t cols, int n,
                     int m, float* pruned, uint8_t* mask) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; ++r) {
    const float* row = w + r * cols;
    float* prow = pruned + r * cols;
    uint8_t* mrow = mask + r * cols;
    for (int64_t g = 0; g < cols; g += m) {
      int gm = static_cast<int>(std::min<int64_t>(m, cols - g));
      uint8_t keep[64];
      // Partial tail group: keep min(n, gm) values of the short group.
      keep_topn(row + g, gm, std::min(n, gm), keep);
      for (int j = 0; j < gm; ++j) {
        mrow[g + j] = keep[j];
        prow[g + j] = keep[j] ? row[g + j] : 0.0f;
      }
    }
  }
}

int sm_prune_check_nm_f32(const float* w, int64_t rows, int64_t cols,
                          int n, int m) {
  for (int64_t r = 0; r < rows; ++r) {
    const float* row = w + r * cols;
    for (int64_t g = 0; g < cols; g += m) {
      int gm = static_cast<int>(std::min<int64_t>(m, cols - g));
      int nnz = 0;
      for (int j = 0; j < gm; ++j) nnz += row[g + j] != 0.0f;
      if (nnz > n) return 0;
    }
  }
  return 1;
}

void sm_compress_24_f32(const float* w, int64_t rows, int64_t cols,
                        float* v0, float* v1, uint8_t* codes) {
  int64_t k4 = (cols + 3) / 4;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; ++r) {
    const float* row = w + r * cols;
    for (int64_t g = 0; g < k4; ++g) {
      float grp[4] = {0, 0, 0, 0};
      int gm = static_cast<int>(std::min<int64_t>(4, cols - g * 4));
      for (int j = 0; j < gm; ++j) grp[j] = row[g * 4 + j];
      uint8_t keep[4];
      keep_topn(grp, 4, 2, keep);
      int i0 = -1, i1 = -1;
      for (int j = 0; j < 4; ++j)
        if (keep[j]) {
          if (i0 < 0)
            i0 = j;
          else
            i1 = j;
        }
      v0[r * k4 + g] = grp[i0];
      v1[r * k4 + g] = grp[i1];
      codes[r * k4 + g] = static_cast<uint8_t>(i0 * 4 + i1);
    }
  }
}

void sm_decompress_24_f32(const float* v0, const float* v1,
                          const uint8_t* codes, int64_t rows, int64_t cols,
                          float* w) {
  int64_t k4 = (cols + 3) / 4;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < rows; ++r) {
    float* row = w + r * cols;
    std::memset(row, 0, sizeof(float) * cols);
    for (int64_t g = 0; g < k4; ++g) {
      uint8_t c = codes[r * k4 + g];
      int i0 = c >> 2, i1 = c & 3;
      if (g * 4 + i0 < cols) row[g * 4 + i0] = v0[r * k4 + g];
      if (g * 4 + i1 < cols) row[g * 4 + i1] += v1[r * k4 + g];
    }
  }
}

void sm_pack_codes(const uint8_t* codes, int64_t n, uint8_t* packed) {
  int64_t half = n / 2;
  for (int64_t i = 0; i < half; ++i)
    packed[i] =
        static_cast<uint8_t>((codes[2 * i] & 0xF) | (codes[2 * i + 1] << 4));
  if (n & 1) packed[half] = codes[n - 1] & 0xF;
}

void sm_unpack_codes(const uint8_t* packed, int64_t n, uint8_t* codes) {
  for (int64_t i = 0; i < n; ++i) {
    uint8_t b = packed[i / 2];
    codes[i] = (i & 1) ? (b >> 4) : (b & 0xF);
  }
}

void sm_prune_block_f32(const float* w, int64_t rows, int64_t cols,
                        int blk_m, int blk_n, float sparsity, float* pruned,
                        uint8_t* mask) {
  int bs = blk_m * blk_n;
  int drop = static_cast<int>(bs * sparsity);  // floor, per reference
  int keepn = bs - drop;
  int64_t mb = rows / blk_m, nb = cols / blk_n;
#pragma omp parallel for schedule(static)
  for (int64_t t = 0; t < mb * nb; ++t) {
    int64_t bi = t / nb, bj = t % nb;
    std::vector<float> flat(bs);
    // Flatten the tile row-major — matches prune.py's
    // blocks.reshape(..., bm*bn) ordering.
    for (int i = 0; i < blk_m; ++i)
      for (int j = 0; j < blk_n; ++j)
        flat[i * blk_n + j] = w[(bi * blk_m + i) * cols + bj * blk_n + j];
    std::vector<uint8_t> keep(bs);
    keep_topn(flat.data(), bs, keepn, keep.data());
    for (int i = 0; i < blk_m; ++i)
      for (int j = 0; j < blk_n; ++j) {
        int64_t idx = (bi * blk_m + i) * cols + bj * blk_n + j;
        mask[idx] = keep[i * blk_n + j];
        pruned[idx] = keep[i * blk_n + j] ? w[idx] : 0.0f;
      }
  }
}

void sm_ell_from_dense_f32(const float* w, int64_t rows, int64_t cols,
                           int bs, int ell_blocks, float* values,
                           int32_t* col_indices) {
  int64_t mb = rows / bs, kb = cols / bs;
#pragma omp parallel for schedule(static)
  for (int64_t br = 0; br < mb; ++br) {
    // Frobenius norm^2 of each candidate tile in this block-row.
    std::vector<double> norm(kb, 0.0);
    for (int i = 0; i < bs; ++i) {
      const float* row = w + (br * bs + i) * cols;
      for (int64_t c = 0; c < cols; ++c)
        norm[c / bs] += static_cast<double>(row[c]) * row[c];
    }
    // Top ell_blocks tiles; ties toward later columns (match JAX path),
    // then ascending index order for the packed layout.
    std::vector<int32_t> idx(kb);
    for (int64_t j = 0; j < kb; ++j) idx[j] = static_cast<int32_t>(j);
    std::partial_sort(idx.begin(), idx.begin() + ell_blocks, idx.end(),
                      [&](int32_t a, int32_t b) {
                        return norm[a] > norm[b] ||
                               (norm[a] == norm[b] && a > b);
                      });
    std::sort(idx.begin(), idx.begin() + ell_blocks);
    for (int e = 0; e < ell_blocks; ++e)
      col_indices[br * ell_blocks + e] = idx[e];
    for (int i = 0; i < bs; ++i) {
      const float* row = w + (br * bs + i) * cols;
      float* vrow = values + (br * bs + i) * (ell_blocks * bs);
      for (int e = 0; e < ell_blocks; ++e)
        std::memcpy(vrow + e * bs, row + idx[e] * bs, sizeof(float) * bs);
    }
  }
}

}  // extern "C"
