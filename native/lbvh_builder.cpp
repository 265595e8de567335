// Native LBVH builder — the scene-build hot path as C++.
//
// The reference's acceleration-structure build is driver-side native code
// (BuildRTAccelerationStructure hands geometry to D3D12,
// DXRPathTracer.cpp:2331-2488); our equivalent owns the build. This module
// produces EXACTLY the same packed arrays as the numpy builder in
// dxrpathtracer_tpu/accel/lbvh.py (morton-ordered median-split layout,
// paired-children internal records, per-leaf packed triangles) so the two are
// interchangeable and cross-checked by tests. C API only — bound with ctypes.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 lbvh_builder.cpp -o liblbvh.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

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

}  // namespace

extern "C" {

// Returns the INTERNAL node count; writes leaf count and tree depth (levels).
int64_t lbvh_count2(int64_t num_tris, int64_t leaf_size,
                    int64_t* out_num_leaves, int64_t* out_depth) {
    std::vector<Range> level = {{0, num_tris}};
    int64_t internal = 0, leaves = 0, depth = 0;
    while (!level.empty()) {
        ++depth;
        std::vector<Range> next;
        for (const Range& r : level) {
            if (r.hi - r.lo > leaf_size) {
                ++internal;
                int64_t mid = (r.lo + r.hi) / 2;
                next.push_back({r.lo, mid});
                next.push_back({mid, r.hi});
            } else {
                ++leaves;
            }
        }
        level.swap(next);
    }
    if (out_num_leaves) *out_num_leaves = leaves;
    if (out_depth) *out_depth = depth;
    return internal;
}

// Build the packed paired-children LBVH.
//   v0/v1/v2: (num_tris, 3) float32 triangle vertices
//   nodes_out: (num_internal, 16) float32
//     [loL.xyz, hiL.xyz, loR.xyz, hiR.xyz, bits(codeL), bits(codeR), 0, 0]
//     code >= 0: internal index; code < 0: ~leaf_index
//   leaves_out: (num_leaves, leaf_size*12) float32 packed triangles
// Returns 0 on success.
int lbvh_build2(const float* v0, const float* v1, const float* v2,
                int64_t num_tris, int64_t leaf_size,
                float* nodes_out, int64_t num_internal,
                float* leaves_out, int64_t num_leaves) {
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);

    // --- morton order over centroids ---
    std::vector<Vec3> centroid(num_tris);
    Vec3 lo = {1e30f, 1e30f, 1e30f}, hi = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = 0; i < num_tris; ++i) {
        centroid[i] = {(a[i].x + b[i].x + c[i].x) / 3.0f,
                       (a[i].y + b[i].y + c[i].y) / 3.0f,
                       (a[i].z + b[i].z + c[i].z) / 3.0f};
        lo = vmin(lo, centroid[i]);
        hi = vmax(hi, centroid[i]);
    }
    const float ex = std::max(hi.x - lo.x, 1e-9f);
    const float ey = std::max(hi.y - lo.y, 1e-9f);
    const float ez = std::max(hi.z - lo.z, 1e-9f);

    std::vector<uint32_t> morton(num_tris);
    for (int64_t i = 0; i < num_tris; ++i) {
        auto q = [](float v, float l, float e) {
            float t = (v - l) / e * 1023.0f;
            t = std::min(std::max(t, 0.0f), 1023.0f);
            return static_cast<uint32_t>(t);
        };
        morton[i] = expand_bits(q(centroid[i].x, lo.x, ex)) * 4u +
                    expand_bits(q(centroid[i].y, lo.y, ey)) * 2u +
                    expand_bits(q(centroid[i].z, lo.z, ez));
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

    // --- BFS level construction (identical ranges to the numpy builder) ---
    std::vector<Range> ranges = {{0, num_tris}};
    std::vector<std::vector<Range>> levels;
    std::vector<int64_t> level_base;
    int64_t base = 0;
    while (!ranges.empty()) {
        levels.push_back(ranges);
        level_base.push_back(base);
        std::vector<Range> next;
        for (const Range& r : ranges) {
            if (r.hi - r.lo > leaf_size) {
                int64_t mid = (r.lo + r.hi) / 2;
                next.push_back({r.lo, mid});
                next.push_back({mid, r.hi});
            }
        }
        base += static_cast<int64_t>(ranges.size());
        ranges.swap(next);
    }
    const int64_t n = base;

    std::vector<int64_t> left(n, -1), range_lo(n), range_hi(n);
    std::vector<bool> is_leaf(n, false);
    for (size_t li = 0; li < levels.size(); ++li) {
        const auto& lev = levels[li];
        int64_t child = level_base[li] + static_cast<int64_t>(lev.size());
        for (size_t k = 0; k < lev.size(); ++k) {
            const int64_t id = level_base[li] + static_cast<int64_t>(k);
            range_lo[id] = lev[k].lo;
            range_hi[id] = lev[k].hi;
            if (lev[k].hi - lev[k].lo > leaf_size) {
                left[id] = child;
                child += 2;
            } else {
                is_leaf[id] = true;
            }
        }
    }

    // --- AABBs bottom-up ---
    std::vector<Vec3> nlo(n), nhi(n);
    for (int64_t li = static_cast<int64_t>(levels.size()) - 1; li >= 0; --li) {
        for (size_t k = 0; k < levels[li].size(); ++k) {
            const int64_t id = level_base[li] + static_cast<int64_t>(k);
            if (is_leaf[id]) {
                Vec3 l = {1e30f, 1e30f, 1e30f}, h = {-1e30f, -1e30f, -1e30f};
                for (int64_t t = range_lo[id]; t < range_hi[id]; ++t) {
                    l = vmin(l, tlo[t]);
                    h = vmax(h, thi[t]);
                }
                nlo[id] = l;
                nhi[id] = h;
            } else {
                nlo[id] = vmin(nlo[left[id]], nlo[left[id] + 1]);
                nhi[id] = vmax(nhi[left[id]], nhi[left[id] + 1]);
            }
        }
    }

    // --- compact internal/leaf indices (BFS order, matches numpy np.where) ---
    std::vector<int64_t> int_index(n, 0), leaf_index(n, 0);
    int64_t ni = 0, nl = 0;
    for (int64_t id = 0; id < n; ++id) {
        if (is_leaf[id]) leaf_index[id] = nl++;
        else int_index[id] = ni++;
    }
    if (ni != num_internal || nl != num_leaves) {
        if (!(ni == 0 && num_internal == 1)) return 1;  // single-leaf case pads
    }

    // --- emit leaves ---
    const int64_t stride = leaf_size * 12;
    std::memset(leaves_out, 0,
                sizeof(float) * static_cast<size_t>(std::max<int64_t>(nl, 1) * stride));
    const int32_t none = -1;
    for (int64_t id = 0; id < n; ++id) {
        if (!is_leaf[id]) continue;
        float* lrec = leaves_out + leaf_index[id] * stride;
        int64_t slot = 0;
        for (int64_t t = range_lo[id]; t < range_hi[id]; ++t, ++slot) {
            float* p = lrec + slot * 12;
            p[0] = sv0[t].x; p[1] = sv0[t].y; p[2] = sv0[t].z;
            p[3] = se1[t].x; p[4] = se1[t].y; p[5] = se1[t].z;
            p[6] = se2[t].x; p[7] = se2[t].y; p[8] = se2[t].z;
            const int32_t tid = static_cast<int32_t>(order[t]);
            std::memcpy(p + 9, &tid, 4);
        }
        for (; slot < leaf_size; ++slot)
            std::memcpy(lrec + slot * 12 + 9, &none, 4);
    }

    // --- emit paired-children internal records ---
    std::memset(nodes_out, 0,
                sizeof(float) * static_cast<size_t>(std::max<int64_t>(ni, 1) * 16));
    for (int64_t id = 0; id < n; ++id) {
        if (is_leaf[id]) continue;
        float* rec = nodes_out + int_index[id] * 16;
        const int64_t cl = left[id], cr = left[id] + 1;
        rec[0] = nlo[cl].x; rec[1] = nlo[cl].y; rec[2] = nlo[cl].z;
        rec[3] = nhi[cl].x; rec[4] = nhi[cl].y; rec[5] = nhi[cl].z;
        rec[6] = nlo[cr].x; rec[7] = nlo[cr].y; rec[8] = nlo[cr].z;
        rec[9] = nhi[cr].x; rec[10] = nhi[cr].y; rec[11] = nhi[cr].z;
        const int32_t code_l = is_leaf[cl]
            ? static_cast<int32_t>(~leaf_index[cl]) : static_cast<int32_t>(int_index[cl]);
        const int32_t code_r = is_leaf[cr]
            ? static_cast<int32_t>(~leaf_index[cr]) : static_cast<int32_t>(int_index[cr]);
        std::memcpy(rec + 12, &code_l, 4);
        std::memcpy(rec + 13, &code_r, 4);
    }
    return 0;
}

}  // extern "C"
