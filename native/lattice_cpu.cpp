// CPU permutohedral-lattice Gaussian filter — native runtime component.
//
// Standalone C++ engine for host-side filtering (data preprocessing, CPU
// serving fallback, and an oracle independent of the JAX path). Same
// mathematical conventions as depth_estimation_tpu.ops.permutohedral:
//   * embedding with scale factors (d+1)*sqrt(2/3)/sqrt((i+1)(i+2))
//   * unnormalized blur kernel [1/2, 1, 1/2] along each of the d+1 axes
//   * slice scaled by 1/(1+2^-d)
// (conventions of the reference implementation's CPU path,
// crf/lattice/lite/permutohedral.h:199-548 — the structure here is a
// different design: sort-based vertex dedup + binary-search neighbor
// lookup, no open-addressing hash table, no replay buffer.)
//
// C ABI (ctypes-friendly):
//   int det_lattice_filter_f32(const float* src, const float* ref,
//                              float* out, int64 n, int L, int d,
//                              int normalize);
// Returns 0 on success. normalize: 0 = none, 1 = homogeneous.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Lattice coordinates of one simplex corner: d int32 coords per vertex.
struct Entry {
  int64_t flat;   // n * (d+1) entry index (pixel * (d+1) + remainder)
  int32_t key0;   // first coordinate (sort accelerator)
};

struct Plan {
  int d = 0;
  int64_t n = 0;
  std::vector<int32_t> keys;      // (num_entries, d) per-entry vertex keys
  std::vector<float> bary;        // (n, d+1)
  std::vector<int64_t> slot;      // (n, d+1) -> vertex id
  std::vector<int32_t> vert_keys; // (num_vertices, d) sorted unique keys
  int64_t num_vertices = 0;
  std::vector<int64_t> neighbors; // (d+1, num_vertices, 2), -1 = missing
};

inline bool key_less(const int32_t* a, const int32_t* b, int d) {
  for (int k = 0; k < d; ++k) {
    if (a[k] != b[k]) return a[k] < b[k];
  }
  return false;
}

inline bool key_eq(const int32_t* a, const int32_t* b, int d) {
  for (int k = 0; k < d; ++k)
    if (a[k] != b[k]) return false;
  return true;
}

// Binary search over the sorted unique-key table. Returns vertex id or -1.
int64_t find_vertex(const Plan& plan, const int32_t* key) {
  int64_t lo = 0, hi = plan.num_vertices;
  const int d = plan.d;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    const int32_t* k = &plan.vert_keys[mid * d];
    if (key_less(k, key, d))
      lo = mid + 1;
    else
      hi = mid;
  }
  if (lo < plan.num_vertices && key_eq(&plan.vert_keys[lo * d], key, d))
    return lo;
  return -1;
}

Plan build_plan(const float* ref, int64_t n, int d) {
  Plan plan;
  plan.d = d;
  plan.n = n;
  const int dp1 = d + 1;
  const int64_t N = n * dp1;

  // Embedding scale factors.
  std::vector<float> sf(d);
  const float gscale = (d + 1) * std::sqrt(2.0f / 3.0f);
  for (int i = 0; i < d; ++i) sf[i] = gscale / std::sqrt(float((i + 1) * (i + 2)));

  std::vector<float> elevated(dp1), barys(d + 2);
  std::vector<int32_t> greedy(dp1), rank(dp1);
  plan.keys.assign(N * d, 0);
  plan.bary.assign(N, 0.f);
  plan.slot.assign(N, -1);

  // canonical simplex offsets
  std::vector<int32_t> canonical(dp1 * dp1);
  for (int r = 0; r < dp1; ++r) {
    for (int j = 0; j < dp1; ++j)
      canonical[r * dp1 + j] = (j <= d - r) ? r : r - dp1;
  }

  for (int64_t i = 0; i < n; ++i) {
    const float* p = ref + i * d;
    // elevate: recurrence form (equivalent to the E-matrix product)
    elevated[d] = -d * p[d - 1] * sf[d - 1];
    for (int k = d - 1; k > 0; --k)
      elevated[k] = elevated[k + 1] - k * p[k - 1] * sf[k - 1] + (k + 2) * p[k] * sf[k];
    elevated[0] = elevated[1] + 2.f * p[0] * sf[0];

    // nearest zero-colored point
    int32_t sum = 0;
    for (int k = 0; k <= d; ++k) {
      float v = elevated[k] / dp1;
      int32_t up = int32_t(std::ceil(v)) * dp1;
      int32_t down = int32_t(std::floor(v)) * dp1;
      greedy[k] = (up - elevated[k] < elevated[k] - down) ? up : down;
      sum += greedy[k];
    }
    sum /= dp1;

    // descending rank of differential, ties to lower index
    for (int k = 0; k <= d; ++k) rank[k] = 0;
    for (int a = 0; a < d; ++a) {
      for (int b = a + 1; b <= d; ++b) {
        if (elevated[a] - greedy[a] < elevated[b] - greedy[b])
          rank[a]++;
        else
          rank[b]++;
      }
    }

    // walk back onto the hyperplane
    for (int k = 0; k <= d; ++k) {
      rank[k] += sum;
      if (rank[k] >= dp1) {
        greedy[k] -= dp1;
        rank[k] -= dp1;
      } else if (rank[k] < 0) {
        greedy[k] += dp1;
        rank[k] += dp1;
      }
    }

    // barycentric coordinates
    std::fill(barys.begin(), barys.end(), 0.f);
    for (int k = 0; k <= d; ++k) {
      float delta = (elevated[k] - greedy[k]) / dp1;
      barys[d - rank[k]] += delta;
      barys[d + 1 - rank[k]] -= delta;
    }
    barys[0] += 1.0f + barys[d + 1];

    for (int r = 0; r <= d; ++r) {
      int64_t e = i * dp1 + r;
      plan.bary[e] = barys[r];
      int32_t* key = &plan.keys[e * d];
      for (int k = 0; k < d; ++k)
        key[k] = greedy[k] + canonical[r * dp1 + rank[k]];
    }
  }

  // Dedup: sort entry indices by key, assign vertex ids to runs.
  std::vector<int64_t> order(N);
  for (int64_t e = 0; e < N; ++e) order[e] = e;
  const int32_t* keys_base = plan.keys.data();
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return key_less(keys_base + a * d, keys_base + b * d, d);
  });

  plan.vert_keys.reserve(N * d);
  int64_t vid = -1;
  const int32_t* prev = nullptr;
  for (int64_t s = 0; s < N; ++s) {
    const int32_t* k = keys_base + order[s] * d;
    if (prev == nullptr || !key_eq(prev, k, d)) {
      ++vid;
      plan.vert_keys.insert(plan.vert_keys.end(), k, k + d);
      prev = k;
    }
    plan.slot[order[s]] = vid;
  }
  plan.num_vertices = vid + 1;

  // Blur neighbors along each of the d+1 axes.
  plan.neighbors.assign(int64_t(dp1) * plan.num_vertices * 2, -1);
  std::vector<int32_t> nk(d);
  for (int j = 0; j <= d; ++j) {
    for (int64_t v = 0; v < plan.num_vertices; ++v) {
      const int32_t* key = &plan.vert_keys[v * d];
      for (int s = 0; s < 2; ++s) {
        int32_t sign = s == 0 ? 1 : -1;
        for (int k = 0; k < d; ++k) nk[k] = key[k] + sign;
        if (j < d) nk[j] = key[j] - sign * d;
        plan.neighbors[(int64_t(j) * plan.num_vertices + v) * 2 + s] =
            find_vertex(plan, nk.data());
      }
    }
  }
  return plan;
}

void apply_plan(const Plan& plan, const float* src, float* out, int L,
                int normalize) {
  const int d = plan.d;
  const int dp1 = d + 1;
  const int64_t n = plan.n;
  const int64_t M = plan.num_vertices;
  const int Lh = normalize ? L + 1 : L;  // homogeneous channel appended

  std::vector<float> vals(M * Lh, 0.f), tmp(M * Lh, 0.f);

  // splat
  for (int64_t i = 0; i < n; ++i) {
    for (int r = 0; r <= d; ++r) {
      int64_t e = i * dp1 + r;
      float w = plan.bary[e];
      float* v = &vals[plan.slot[e] * Lh];
      const float* s = src + i * L;
      for (int c = 0; c < L; ++c) v[c] += w * s[c];
      if (normalize) v[L] += w;
    }
  }

  // blur: d+1 passes of [1/2, 1, 1/2]
  for (int j = 0; j <= d; ++j) {
    const int64_t* nb = &plan.neighbors[int64_t(j) * M * 2];
    for (int64_t v = 0; v < M; ++v) {
      const float* self = &vals[v * Lh];
      int64_t n1 = nb[v * 2 + 0], n2 = nb[v * 2 + 1];
      const float* v1 = n1 >= 0 ? &vals[n1 * Lh] : nullptr;
      const float* v2 = n2 >= 0 ? &vals[n2 * Lh] : nullptr;
      float* dst = &tmp[v * Lh];
      for (int c = 0; c < Lh; ++c) {
        float acc = self[c];
        if (v1) acc += 0.5f * v1[c];
        if (v2) acc += 0.5f * v2[c];
        dst[c] = acc;
      }
    }
    std::swap(vals, tmp);
  }

  // slice
  const float scale = 1.0f / (1.0f + std::pow(2.0f, -d));
  for (int64_t i = 0; i < n; ++i) {
    float acc_h = 0.f;
    float* o = out + i * L;
    for (int c = 0; c < L; ++c) o[c] = 0.f;
    for (int r = 0; r <= d; ++r) {
      int64_t e = i * dp1 + r;
      float w = plan.bary[e] * scale;
      const float* v = &vals[plan.slot[e] * Lh];
      for (int c = 0; c < L; ++c) o[c] += w * v[c];
      if (normalize) acc_h += w * v[L];
    }
    if (normalize) {
      float inv = 1.0f / std::max(acc_h, 1e-20f);
      for (int c = 0; c < L; ++c) o[c] *= inv;
    }
  }
}

}  // namespace

extern "C" {

int det_lattice_filter_f32(const float* src, const float* ref, float* out,
                           int64_t n, int L, int d, int normalize) {
  if (n <= 0 || L <= 0 || d <= 0) return 1;
  Plan plan = build_plan(ref, n, d);
  apply_plan(plan, src, out, L, normalize);
  return 0;
}

// Reusable-plan API for many filterings against one reference (the
// init/compute split): build once, apply many, destroy.
void* det_lattice_plan_build(const float* ref, int64_t n, int d) {
  return new Plan(build_plan(ref, n, d));
}

int det_lattice_plan_apply(void* plan_ptr, const float* src, float* out,
                           int L, int normalize) {
  if (!plan_ptr) return 1;
  apply_plan(*static_cast<Plan*>(plan_ptr), src, out, L, normalize);
  return 0;
}

int64_t det_lattice_plan_vertices(void* plan_ptr) {
  return plan_ptr ? static_cast<Plan*>(plan_ptr)->num_vertices : -1;
}

void det_lattice_plan_free(void* plan_ptr) {
  delete static_cast<Plan*>(plan_ptr);
}

}  // extern "C"
