// Native host-side preprocessing kernels for the Kubric data path.
//
// Replaces the hottest numpy work in tcow_tpu/data/data_utils.py (reference behavior:
// /root/reference/data/data_utils.py:57-241): per-instance visible/amodal pixel counting
// and the pairwise overlap statistics feeding the occlusion/containment DAG.
//
// Design: per pixel, instance membership is packed into a 64-bit bitset and combined with
// the visible instance id into a single key (mask << 7 | id; valid for K <= 57, and this
// pipeline pads instances to M = 36). Per-frame statistics are then accumulated over a
// histogram of *unique* keys -- scenes contain few distinct overlap patterns, so the
// quadratic pair expansion runs over O(unique) entries instead of O(pixels).
//
// Build: g++ -O3 -shared -fPIC preprocess.cpp -o libtcow_preprocess.so
// Loaded via ctypes (tcow_tpu/native/__init__.py); the numpy path remains as fallback.

#include <cstdint>
#include <unordered_map>

extern "C" {

// All-in-one per-frame statistics.
//   segm:    (T, H, W) int32, 1-based visible instance ids, 0 = background.
//   div:     (T, H, W, K) uint8 amodal masks ({0, 1}).
// Outputs (zero-initialized by the caller):
//   vis_cnt: (T, K) int64   -- #pixels with segm == k+1
//   tot_cnt: (T, K) int64   -- #pixels with div[..., k] == 1
//   dd:      (T, K, K) int64 -- #pixels where div[k] and div[l] are both 1
//   dv:      (T, K, K) int64 -- #pixels where div[k] == 1 and segm == l+1
// Returns 0 on success, nonzero if K is out of range (caller falls back to numpy).
int scene_overlap_stats(const int32_t* segm, const uint8_t* div,
                        int64_t T, int64_t H, int64_t W, int64_t K,
                        int64_t* vis_cnt, int64_t* tot_cnt,
                        int64_t* dd, int64_t* dv) {
  if (K < 1 || K > 57) return 1;
  const int64_t P = H * W;
  std::unordered_map<uint64_t, int64_t> hist;
  hist.reserve(4096);

  for (int64_t t = 0; t < T; ++t) {
    hist.clear();
    const int32_t* s = segm + t * P;
    const uint8_t* d = div + t * P * K;
    int64_t* vis = vis_cnt + t * K;

    for (int64_t p = 0; p < P; ++p) {
      uint64_t m = 0;
      const uint8_t* row = d + p * K;
      for (int64_t k = 0; k < K; ++k) m |= (uint64_t)(row[k] == 1) << k;
      const int32_t raw_id = s[p];
      const uint64_t id = (raw_id >= 1 && raw_id <= K) ? (uint64_t)raw_id : 0;
      if (id != 0) vis[id - 1]++;
      if (m != 0) hist[(m << 7) | id]++;
    }

    int64_t* tot = tot_cnt + t * K;
    int64_t* dd_t = dd + t * K * K;
    int64_t* dv_t = dv + t * K * K;
    for (const auto& kv : hist) {
      const uint64_t mask = kv.first >> 7;
      const uint64_t id = kv.first & 0x7f;
      const int64_t c = kv.second;
      // Expand set bits once.
      int nbits = 0;
      int bits[64];
      for (uint64_t mm = mask; mm; mm &= (mm - 1)) {
        bits[nbits++] = __builtin_ctzll(mm);
      }
      for (int i = 0; i < nbits; ++i) {
        const int k = bits[i];
        tot[k] += c;
        if (id != 0) dv_t[k * K + (id - 1)] += c;
        for (int j = 0; j < nbits; ++j) dd_t[k * K + bits[j]] += c;
      }
    }
  }
  return 0;
}

// Painter's-algorithm reconstruction of the visible segmentation from amodal masks.
//   div:   (T, H, W, K) uint8
//   order: (T, K) int32 instance indices back-to-front
//   recon: (T, H, W) int32 output (zero-initialized by the caller)
void paint_recon_segm(const uint8_t* div, const int32_t* order,
                      int64_t T, int64_t H, int64_t W, int64_t K, int32_t* recon) {
  const int64_t P = H * W;
  for (int64_t t = 0; t < T; ++t) {
    const uint8_t* d = div + t * P * K;
    const int32_t* ord = order + t * K;
    int32_t* r = recon + t * P;
    for (int64_t p = 0; p < P; ++p) {
      const uint8_t* row = d + p * K;
      // Walk front-to-back and take the first hit (equivalent to painting back-to-front).
      for (int64_t oi = K - 1; oi >= 0; --oi) {
        const int32_t k = ord[oi];
        if (row[k] == 1) {
          r[p] = k + 1;
          break;
        }
      }
    }
  }
}

}  // extern "C"
