// Native wide-BVH builder — the scene-build hot path as C++.
//
// The reference's acceleration-structure build is driver-side native code
// (BuildRTAccelerationStructure hands geometry to D3D12,
// DXRPathTracer.cpp:2331-2488); our equivalent owns the build. This module
// produces EXACTLY the same packed table as the numpy builder in
// dxrpathtracer_tpu/accel/lbvh.py (morton-ordered 8-ary eighth-splits, BFS
// rows, unified 128-float records) so the two are interchangeable and
// cross-checked by tests. C API only — bound from Python with ctypes.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 lbvh_builder.cpp -o liblbvh.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int kWidth = 8;
constexpr int kRecord = 128;
constexpr int kLeafSize = 12;  // SoA leaf blocks, kLeafSize slots per field

struct Vec3 {
    float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

inline uint32_t expand_bits(uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
}

struct Range {
    int64_t lo, hi;
};

void levelize(int64_t num_tris, int64_t leaf_size,
              std::vector<std::vector<Range>>* levels) {
    std::vector<Range> cur = {{0, num_tris}};
    while (!cur.empty()) {
        levels->push_back(cur);
        std::vector<Range> next;
        for (const Range& r : cur) {
            const int64_t cnt = r.hi - r.lo;
            if (cnt > leaf_size) {
                for (int k = 0; k < kWidth; ++k) {
                    next.push_back({r.lo + (cnt * k) / kWidth,
                                    r.lo + (cnt * (k + 1)) / kWidth});
                }
            }
        }
        cur.swap(next);
    }
}

}  // namespace

extern "C" {

// Returns the total row count; writes leaf count, depth (levels), root code.
int64_t lbvh_count3(int64_t num_tris, int64_t leaf_size,
                    int64_t* out_num_leaves, int64_t* out_depth,
                    int64_t* out_root_code) {
    std::vector<std::vector<Range>> levels;
    levelize(num_tris, leaf_size, &levels);
    int64_t rows = 0, leaves = 0;
    for (const auto& lev : levels) {
        rows += static_cast<int64_t>(lev.size());
        for (const Range& r : lev)
            if (r.hi - r.lo <= leaf_size) ++leaves;
    }
    if (out_num_leaves) *out_num_leaves = leaves;
    if (out_depth) *out_depth = static_cast<int64_t>(levels.size());
    if (out_root_code) *out_root_code = (num_tris <= leaf_size) ? ~int64_t(0) : 0;
    return rows;
}

// Build the unified 8-ary table: (num_rows, 128) float32 records
// (layout documented in dxrpathtracer_tpu/accel/lbvh.py). Returns 0 on success.
int lbvh_build3(const float* v0, const float* v1, const float* v2,
                int64_t num_tris, int64_t leaf_size,
                float* table, int64_t num_rows) {
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);

    // --- morton order over centroids ---
    std::vector<Vec3> centroid(num_tris);
    Vec3 clo = {1e30f, 1e30f, 1e30f}, chi = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = 0; i < num_tris; ++i) {
        centroid[i] = {(a[i].x + b[i].x + c[i].x) / 3.0f,
                       (a[i].y + b[i].y + c[i].y) / 3.0f,
                       (a[i].z + b[i].z + c[i].z) / 3.0f};
        clo = vmin(clo, centroid[i]);
        chi = vmax(chi, centroid[i]);
    }
    const float ex = std::max(chi.x - clo.x, 1e-9f);
    const float ey = std::max(chi.y - clo.y, 1e-9f);
    const float ez = std::max(chi.z - clo.z, 1e-9f);

    std::vector<uint32_t> morton(num_tris);
    for (int64_t i = 0; i < num_tris; ++i) {
        auto q = [](float v, float l, float e) {
            float t = (v - l) / e * 1023.0f;
            t = std::min(std::max(t, 0.0f), 1023.0f);
            return static_cast<uint32_t>(t);
        };
        morton[i] = expand_bits(q(centroid[i].x, clo.x, ex)) * 4u +
                    expand_bits(q(centroid[i].y, clo.y, ey)) * 2u +
                    expand_bits(q(centroid[i].z, clo.z, ez));
    }
    std::vector<int64_t> order(num_tris);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t i, int64_t j) { return morton[i] < morton[j]; });

    std::vector<Vec3> sv0(num_tris), se1(num_tris), se2(num_tris);
    std::vector<Vec3> tlo(num_tris), thi(num_tris);
    for (int64_t i = 0; i < num_tris; ++i) {
        const int64_t s = order[i];
        sv0[i] = a[s];
        se1[i] = {b[s].x - a[s].x, b[s].y - a[s].y, b[s].z - a[s].z};
        se2[i] = {c[s].x - a[s].x, c[s].y - a[s].y, c[s].z - a[s].z};
        tlo[i] = vmin(vmin(a[s], b[s]), c[s]);
        thi[i] = vmax(vmax(a[s], b[s]), c[s]);
    }

    // --- BFS rows (identical structure to the numpy builder) ---
    std::vector<std::vector<Range>> levels;
    levelize(num_tris, leaf_size, &levels);
    const int64_t depth = static_cast<int64_t>(levels.size());
    std::vector<int64_t> level_base(depth);
    int64_t rows = 0;
    for (int64_t li = 0; li < depth; ++li) {
        level_base[li] = rows;
        rows += static_cast<int64_t>(levels[li].size());
    }
    if (rows != num_rows) return 1;

    std::vector<Range> row_range(rows);
    std::vector<bool> is_leaf(rows);
    std::vector<int64_t> first_child(rows, -1);
    for (int64_t li = 0; li < depth; ++li) {
        int64_t child = (li + 1 < depth) ? level_base[li + 1] : rows;
        for (size_t k = 0; k < levels[li].size(); ++k) {
            const int64_t rid = level_base[li] + static_cast<int64_t>(k);
            row_range[rid] = levels[li][k];
            const bool leaf = (levels[li][k].hi - levels[li][k].lo) <= leaf_size;
            is_leaf[rid] = leaf;
            if (!leaf) {
                first_child[rid] = child;
                child += kWidth;
            }
        }
    }

    // --- AABBs bottom-up ---
    std::vector<Vec3> nlo(rows), nhi(rows);
    for (int64_t li = depth - 1; li >= 0; --li) {
        for (size_t k = 0; k < levels[li].size(); ++k) {
            const int64_t rid = level_base[li] + static_cast<int64_t>(k);
            if (is_leaf[rid]) {
                Vec3 l = {1e30f, 1e30f, 1e30f}, h = {-1e30f, -1e30f, -1e30f};
                for (int64_t t = row_range[rid].lo; t < row_range[rid].hi; ++t) {
                    l = vmin(l, tlo[t]);
                    h = vmax(h, thi[t]);
                }
                nlo[rid] = l;
                nhi[rid] = h;
            } else {
                Vec3 l = {1e30f, 1e30f, 1e30f}, h = {-1e30f, -1e30f, -1e30f};
                for (int k2 = 0; k2 < kWidth; ++k2) {
                    l = vmin(l, nlo[first_child[rid] + k2]);
                    h = vmax(h, nhi[first_child[rid] + k2]);
                }
                nlo[rid] = l;
                nhi[rid] = h;
            }
        }
    }

    // --- emit unified records ---
    std::memset(table, 0, sizeof(float) * static_cast<size_t>(rows * kRecord));
    const int32_t none = -1;
    for (int64_t rid = 0; rid < rows; ++rid) {
        float* rec = table + rid * kRecord;
        if (is_leaf[rid]) {
            // SoA blocks [v0x v0y v0z e1x e1y e1z e2x e2y e2z tid], each
            // kLeafSize slots wide (layout documented in accel/lbvh.py).
            for (int slot = 0; slot < kLeafSize; ++slot)
                std::memcpy(rec + 9 * kLeafSize + slot, &none, 4);
            int64_t slot = 0;
            for (int64_t t = row_range[rid].lo; t < row_range[rid].hi; ++t, ++slot) {
                rec[0 * kLeafSize + slot] = sv0[t].x;
                rec[1 * kLeafSize + slot] = sv0[t].y;
                rec[2 * kLeafSize + slot] = sv0[t].z;
                rec[3 * kLeafSize + slot] = se1[t].x;
                rec[4 * kLeafSize + slot] = se1[t].y;
                rec[5 * kLeafSize + slot] = se1[t].z;
                rec[6 * kLeafSize + slot] = se2[t].x;
                rec[7 * kLeafSize + slot] = se2[t].y;
                rec[8 * kLeafSize + slot] = se2[t].z;
                const int32_t tid = static_cast<int32_t>(order[t]);
                std::memcpy(rec + 9 * kLeafSize + slot, &tid, 4);
            }
        } else {
            for (int k = 0; k < kWidth; ++k) {
                const int64_t ch = first_child[rid] + k;
                rec[0 + k] = nlo[ch].x;
                rec[8 + k] = nlo[ch].y;
                rec[16 + k] = nlo[ch].z;
                rec[24 + k] = nhi[ch].x;
                rec[32 + k] = nhi[ch].y;
                rec[40 + k] = nhi[ch].z;
                const int32_t code = is_leaf[ch]
                    ? static_cast<int32_t>(~ch) : static_cast<int32_t>(ch);
                std::memcpy(rec + 48 + k, &code, 4);
            }
        }
    }
    return 0;
}

}  // extern "C"
