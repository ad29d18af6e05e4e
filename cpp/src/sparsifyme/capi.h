/* C ABI for the sparsify.me-TPU native host runtime.
 *
 * TPU-native counterpart of the reference's header-only C++ host layer
 * (include/sparsify.me/{util,containers}, SURVEY.md C4/C5): shape-CSV
 * reading, host-side 2:4 and block prune/compress oracles, metadata
 * packing, and a monotonic timer. The device compute path stays
 * JAX/XLA/Pallas; this library is the native data-prep / verification /
 * CLI substrate, exposed to Python via ctypes (no pybind11 in image).
 */
#ifndef SPARSIFYME_CAPI_H_
#define SPARSIFYME_CAPI_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- shapes CSV (reference util::read_shapes, util/util.hxx:36-61) ---- */
/* Parses "m,n,k,b" rows (header skipped). Writes up to max_rows*4 ints
 * into out (row-major). Returns number of rows parsed, or -1 on error. */
long sm_read_shapes(const char* path, int64_t* out, long max_rows);

/* ---- monotonic timer (reference util::timer_t, util/timer.hxx) ---- */
double sm_now_ms(void);

/* ---- 2:4 structured sparsity, host-side (SURVEY.md C1/C6) ----
 * All matrices row-major float32. rows = #rows, cols = #cols (cols % 4
 * need not hold; the tail group is handled as a partial group). */

/* Magnitude N:M prune in-place companion: writes pruned copy and 0/1
 * mask. Keeps the n largest-|.| of each m-length group along a row;
 * ties broken toward later positions (matches the JAX ops). */
void sm_prune_nm_f32(const float* w, int64_t rows, int64_t cols, int n,
                     int m, float* pruned, uint8_t* mask);

/* Returns 1 if every m-group has <= n nonzeros, else 0. */
int sm_prune_check_nm_f32(const float* w, int64_t rows, int64_t cols,
                          int n, int m);

/* 2:4 compress: per 4-group keep the 2 largest-|.| values.
 * v0/v1: [rows, ceil(cols/4)] value planes; codes: i0*4+i1 per group
 * (i0 < i1, positions of kept values). */
void sm_compress_24_f32(const float* w, int64_t rows, int64_t cols,
                        float* v0, float* v1, uint8_t* codes);

/* Inverse of sm_compress_24_f32 (zeros elsewhere). */
void sm_decompress_24_f32(const float* v0, const float* v1,
                          const uint8_t* codes, int64_t rows, int64_t cols,
                          float* w);

/* Pack/unpack code planes: 2 codes (4 bits each) per byte. n = #codes. */
void sm_pack_codes(const uint8_t* codes, int64_t n, uint8_t* packed);
void sm_unpack_codes(const uint8_t* packed, int64_t n, uint8_t* codes);

/* ---- blocked magnitude prune (SURVEY.md C1 capability) ----
 * Zeroes all but the top (1-sparsity)*blk_m*blk_n elements (by |.|) of
 * every blk_m x blk_n tile. rows % blk_m == 0, cols % blk_n == 0. */
void sm_prune_block_f32(const float* w, int64_t rows, int64_t cols,
                        int blk_m, int blk_n, float sparsity, float* pruned,
                        uint8_t* mask);

/* ---- blocked-ELL host packing (reference ell_t, containers/ell.hxx) ----
 * Select the top ell_blocks tiles per block-row by Frobenius norm and
 * pack values [rows, ell_blocks*bs] + ascending col indices
 * [rows/bs, ell_blocks]. rows % bs == 0, cols % bs == 0. */
void sm_ell_from_dense_f32(const float* w, int64_t rows, int64_t cols,
                           int bs, int ell_blocks, float* values,
                           int32_t* col_indices);

/* Version / ABI probe. */
int sm_abi_version(void);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* SPARSIFYME_CAPI_H_ */
