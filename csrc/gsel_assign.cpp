// First-fit slot assignment for the gsel lane-group scheme.
//
// The gsel SpMV (tpu_spai/kernels/gsel.py) reads the chunk map per
// (slot-row k, COLUMN lane group): slot row k may serve a different x-chunk
// in each lane group, so rows whose neighbors fall in different chunks can
// share slot rows. Minimizing K' (the slot-grid height and with it every
// plane tensor) is a flexible bin-packing; this greedy first-fit gets
// within ~10-20% of the per-row lower bound max_t nnz(t) on FEM patterns,
// vs the 3-6x padding of the single-chunk-per-row construction.
//
// Edges must arrive grouped by tile (any order within a tile; callers sort
// by (tile, lane-group, chunk, row) so same-chunk edges cluster and reuse
// slot rows). Exposed via C ABI for ctypes (tpu_spai/native.py).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns K' (max slots used over tiles), or -1 if some tile needs more
// than max_k slot rows. qmap must be pre-filled with -1 and sized
// [n_tiles * max_k * ng]; slot_k is [nnz].
int64_t gsel_first_fit(int64_t nnz, const int64_t* tile, const int32_t* lg,
                       const int32_t* q, const int32_t* rlane,
                       int64_t n_tiles, int32_t ng, int32_t tile_rows,
                       int32_t max_k, int32_t* slot_k, int32_t* qmap) {
  std::vector<uint8_t> occ((size_t)max_k * tile_rows);
  int64_t kprime = 1;
  int64_t i = 0;
  while (i < nnz) {
    const int64_t t = tile[i];
    std::fill(occ.begin(), occ.end(), 0);
    int32_t* qm = qmap + (size_t)t * max_k * ng;
    int kmax_tile = 0;
    int64_t j = i;
    for (; j < nnz && tile[j] == t; ++j) {
      const int32_t g = lg[j], qq = q[j], r = rlane[j];
      int k = 0;
      for (; k < max_k; ++k) {
        const int32_t cur = qm[(size_t)k * ng + g];
        if ((cur == -1 || cur == qq) && !occ[(size_t)k * tile_rows + r])
          break;
      }
      if (k >= max_k) return -1;
      qm[(size_t)k * ng + g] = qq;
      occ[(size_t)k * tile_rows + r] = 1;
      slot_k[j] = k;
      if (k + 1 > kmax_tile) kmax_tile = k + 1;
    }
    if (kmax_tile > kprime) kprime = kmax_tile;
    i = j;
  }
  return kprime;
}

// Window first-fit: slot row k of a tile has ONE base chunk base_k shared
// by all tile_rows rows; an edge (chunk q, row r) fits slot (k, r) iff
// base_k <= q < base_k + w and the cell is free. New slot rows take
// base = q of the first edge that opens them. With w >= 2 this recovers
// the chunk-boundary-straddle padding of the single-chunk scheme: K'
// reaches the max row degree on RCM-ordered FEM patterns (vs ~2x that),
// halving every downstream plane tensor. Edges must arrive sorted by
// (tile, chunk, row) — chunk-major, so bases are coordinated per tile.
//
// Returns K' (max slots over tiles), or -1 if a tile needs > max_k rows.
// base must be pre-filled with -1 and sized [n_tiles * max_k]; slot_k is
// [nnz].
int64_t gsel_window_fit(int64_t nnz, const int64_t* tile, const int32_t* q,
                        const int32_t* rlane, int64_t n_tiles, int32_t w,
                        int32_t tile_rows, int32_t max_k, int32_t* slot_k,
                        int32_t* base) {
  std::vector<uint8_t> occ((size_t)max_k * tile_rows);
  int64_t kprime = 1;
  int64_t i = 0;
  while (i < nnz) {
    const int64_t t = tile[i];
    std::fill(occ.begin(), occ.end(), 0);
    int32_t* bs = base + (size_t)t * max_k;
    int kmax_tile = 0;
    int64_t j = i;
    for (; j < nnz && tile[j] == t; ++j) {
      const int32_t qq = q[j], r = rlane[j];
      int k = 0;
      for (; k < max_k; ++k) {
        const int32_t b = bs[k];
        if (b == -1 || (b <= qq && qq < b + w)) {
          if (!occ[(size_t)k * tile_rows + r]) break;
        }
      }
      if (k >= max_k) return -1;
      if (bs[k] == -1) bs[k] = qq;
      occ[(size_t)k * tile_rows + r] = 1;
      slot_k[j] = k;
      if (k + 1 > kmax_tile) kmax_tile = k + 1;
    }
    if (kmax_tile > kprime) kprime = kmax_tile;
    i = j;
  }
  return kprime;
}

}  // extern "C"
