// Native binned-SAH wide-BVH builder — the scene-build hot path as C++.
//
// The reference's acceleration structure is driver-built with
// D3D12_RAYTRACING_ACCELERATION_STRUCTURE_BUILD_FLAG_PREFER_FAST_TRACE
// (DXRPathTracer.cpp:2331-2488) — i.e. a quality (SAH-class) build. The
// morton eighth-split builder (lbvh_builder.cpp) is the fast-build analog;
// this one is the fast-trace analog: a top-down binary binned SAH (16 bins,
// largest centroid axis) collapsed into 8-wide nodes by repeatedly expanding
// the child with the largest surface area. Measured on the 246k-tri
// Sponza-class stand-in it roughly halves the wavefront's lockstep step
// count versus the morton build.
//
// Emits EXACTLY the same unified (rows, 128) f32 record table as
// dxrpathtracer_tpu/accel/lbvh.py documents, and is kept bit-identical with
// the numpy mirror (build_table_numpy_sah) — cross-checked in tests. All
// FP decisions use f32 with no contraction so Python and C++ agree.
//
// Build: g++ -O3 -ffp-contract=off -shared -fPIC -std=c++17 sah_builder.cpp -o libsah.so

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kWidth = 8;
constexpr int kRecord = 128;
constexpr int kLeafSize = 12;
constexpr int kBins = 16;

struct Vec3 {
    float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Aabb {
    Vec3 lo = {3e38f, 3e38f, 3e38f};
    Vec3 hi = {-3e38f, -3e38f, -3e38f};
    void grow(const Aabb& o) {
        lo = vmin(lo, o.lo);
        hi = vmax(hi, o.hi);
    }
    void grow(const Vec3& p) {
        lo = vmin(lo, p);
        hi = vmax(hi, p);
    }
    float half_area() const {
        const float dx = std::max(hi.x - lo.x, 0.0f);
        const float dy = std::max(hi.y - lo.y, 0.0f);
        const float dz = std::max(hi.z - lo.z, 0.0f);
        return dx * dy + dy * dz + dz * dx;
    }
};

// Binary SAH node over a contiguous range of the (reordered) triangle array.
struct BNode {
    Aabb box;
    int64_t lo, hi;       // triangle range [lo, hi)
    int64_t left = -1;    // binary children (-1 => leaf)
    int64_t right = -1;
};

constexpr int kMaxWidth = 32;

struct Builder {
    std::vector<Vec3> tlo, thi, cent;  // per ORIGINAL triangle
    std::vector<int64_t> order;        // build-reordered triangle ids
    std::vector<BNode> bnodes;
    int64_t leaf_size = kLeafSize;
    int width = kWidth;                // collapse fanout (8 classic, 16/32 wide)

    Aabb tri_box(int64_t t) const {
        Aabb b;
        b.lo = tlo[t];
        b.hi = thi[t];
        return b;
    }

    int64_t build_binary(int64_t lo, int64_t hi) {
        BNode node;
        node.lo = lo;
        node.hi = hi;
        Aabb cbox;  // centroid bounds drive the binning
        for (int64_t i = lo; i < hi; ++i) {
            node.box.grow(tri_box(order[i]));
            cbox.grow(cent[order[i]]);
        }
        const int64_t idx = static_cast<int64_t>(bnodes.size());
        bnodes.push_back(node);
        const int64_t count = hi - lo;
        if (count <= leaf_size) return idx;

        // All-axes binned SAH: evaluate every axis with centroid extent > 0
        // and take the globally cheapest split (strict < keeps the lowest
        // axis on ties — matched exactly by lbvh.py build_table_numpy_sah
        // for bit-identity).
        const float exts[3] = {cbox.hi.x - cbox.lo.x,
                               cbox.hi.y - cbox.lo.y,
                               cbox.hi.z - cbox.lo.z};
        const float clos[3] = {cbox.lo.x, cbox.lo.y, cbox.lo.z};

        float best_cost = 3e38f;
        int best_axis = -1;
        int best_split = -1;
        float best_clo = 0.0f, best_scale = 0.0f;
        int64_t best_lcnt = 0;
        for (int axis = 0; axis < 3; ++axis) {
            const float ext = exts[axis];
            if (!(ext > 0.0f)) continue;
            const float clo = clos[axis];
            const float scale = static_cast<float>(kBins) / ext;
            Aabb bin_box[kBins];
            int64_t bin_cnt[kBins] = {0};
            auto bin_of = [&](int64_t t) {
                const float c = (axis == 0) ? cent[t].x : (axis == 1) ? cent[t].y : cent[t].z;
                int b = static_cast<int>((c - clo) * scale);
                return std::min(std::max(b, 0), kBins - 1);
            };
            for (int64_t i = lo; i < hi; ++i) {
                const int b = bin_of(order[i]);
                bin_box[b].grow(tri_box(order[i]));
                ++bin_cnt[b];
            }
            // Sweep: best split between bins b and b+1 minimizing
            // Al*Nl + Ar*Nr (exact AABBs -> deterministic f32 costs).
            Aabb right_acc[kBins];
            Aabb acc;
            for (int b = kBins - 1; b >= 1; --b) {
                acc.grow(bin_box[b]);
                right_acc[b] = acc;
            }
            Aabb lacc;
            int64_t lcnt = 0;
            for (int b = 0; b < kBins - 1; ++b) {
                lacc.grow(bin_box[b]);
                lcnt += bin_cnt[b];
                const int64_t rcnt = count - lcnt;
                if (lcnt == 0 || rcnt == 0) continue;
                const float cost = lacc.half_area() * static_cast<float>(lcnt)
                                 + right_acc[b + 1].half_area() * static_cast<float>(rcnt);
                if (cost < best_cost) {
                    best_cost = cost;
                    best_axis = axis;
                    best_split = b;
                    best_clo = clo;
                    best_scale = scale;
                    int64_t l = 0;
                    for (int bb = 0; bb <= b; ++bb) l += bin_cnt[bb];
                    best_lcnt = l;
                }
            }
        }

        int64_t mid;
        if (best_axis < 0) {
            mid = lo + count / 2;  // no usable split: median fallback
        } else {
            auto bin_of_best = [&](int64_t t) {
                const float c = (best_axis == 0) ? cent[t].x
                              : (best_axis == 1) ? cent[t].y : cent[t].z;
                int b = static_cast<int>((c - best_clo) * best_scale);
                return std::min(std::max(b, 0), kBins - 1);
            };
            // Stable partition keeps build order deterministic.
            std::stable_partition(order.begin() + lo, order.begin() + hi,
                                  [&](int64_t t) { return bin_of_best(t) <= best_split; });
            mid = lo + best_lcnt;
        }
        const int64_t li = build_binary(lo, mid);
        const int64_t ri = build_binary(mid, hi);
        bnodes[idx].left = li;
        bnodes[idx].right = ri;
        return idx;
    }

    // --- collapse binary -> 8-wide, BFS row emission ---
    // wide node = up to 8 binary-subtree roots, chosen by repeatedly
    // expanding the internal candidate with the largest surface area.
    std::vector<std::vector<int64_t>> wide_children;  // per wide row: bnode ids
    std::vector<int64_t> wide_of_bnode;  // split emission: row -> internal idx
    std::vector<int64_t> leaf_renumber;  // split emission: row -> leaf idx
    std::vector<int64_t> rows_range_lo, rows_range_hi;
    std::vector<bool> rows_is_leaf;
    std::vector<std::array<int64_t, kMaxWidth>> rows_child;  // wide child rows
    std::vector<Aabb> rows_box;
    int64_t depth = 0;

    void collapse(int64_t broot) {
        // BFS over wide nodes.
        struct Item {
            int64_t bnode;
            int64_t level;
        };
        std::vector<Item> queue = {{broot, 0}};
        // First create the row for each queued bnode, then process.
        auto make_row = [&](int64_t bn) {
            const int64_t rid = static_cast<int64_t>(rows_is_leaf.size());
            const BNode& node = bnodes[bn];
            rows_is_leaf.push_back(node.left < 0);
            rows_range_lo.push_back(node.lo);
            rows_range_hi.push_back(node.hi);
            std::array<int64_t, kMaxWidth> none_children;
            none_children.fill(-1);
            rows_child.push_back(none_children);
            rows_box.push_back(node.box);
            return rid;
        };
        std::vector<int64_t> row_of;  // parallel to queue
        row_of.push_back(make_row(broot));
        for (size_t qi = 0; qi < queue.size(); ++qi) {
            const int64_t bn = queue[qi].bnode;
            const int64_t rid = row_of[qi];
            const int64_t level = queue[qi].level;
            depth = std::max(depth, level + 1);
            if (bnodes[bn].left < 0) continue;  // leaf row

            // Gather up to kWidth subtree roots.
            std::vector<int64_t> roots = {bnodes[bn].left, bnodes[bn].right};
            while (static_cast<int>(roots.size()) < width) {
                int pick = -1;
                float best_area = -1.0f;
                for (size_t i = 0; i < roots.size(); ++i) {
                    const BNode& c = bnodes[roots[i]];
                    if (c.left < 0) continue;  // can't expand a leaf
                    const float a = c.box.half_area();
                    if (a > best_area) {
                        best_area = a;
                        pick = static_cast<int>(i);
                    }
                }
                if (pick < 0) break;
                const int64_t expanded = roots[pick];
                roots[pick] = bnodes[expanded].left;
                roots.insert(roots.begin() + pick + 1, bnodes[expanded].right);
            }
            for (size_t k = 0; k < roots.size(); ++k) {
                queue.push_back({roots[k], level + 1});
                const int64_t crid = make_row(roots[k]);
                row_of.push_back(crid);
                rows_child[rid][k] = crid;
            }
        }
    }
};

Builder* g_builder = nullptr;

}  // namespace

extern "C" {

// Phase 1: full build. Returns row count; writes leaves/depth/root_code.
int64_t sah_count3(const float* v0, const float* v1, const float* v2,
                   int64_t num_tris, int64_t leaf_size,
                   int64_t* out_num_leaves, int64_t* out_depth,
                   int64_t* out_root_code) {
    delete g_builder;
    g_builder = new Builder();
    Builder& B = *g_builder;
    B.leaf_size = leaf_size;
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);
    B.tlo.resize(num_tris);
    B.thi.resize(num_tris);
    B.cent.resize(num_tris);
    B.order.resize(num_tris);
    for (int64_t i = 0; i < num_tris; ++i) {
        B.tlo[i] = vmin(vmin(a[i], b[i]), c[i]);
        B.thi[i] = vmax(vmax(a[i], b[i]), c[i]);
        B.cent[i] = {(a[i].x + b[i].x + c[i].x) / 3.0f,
                     (a[i].y + b[i].y + c[i].y) / 3.0f,
                     (a[i].z + b[i].z + c[i].z) / 3.0f};
        B.order[i] = i;
    }
    B.bnodes.reserve(2 * static_cast<size_t>(num_tris) / std::max<int64_t>(leaf_size, 1) + 16);
    const int64_t broot = B.build_binary(0, num_tris);
    B.collapse(broot);

    int64_t leaves = 0;
    for (bool l : B.rows_is_leaf) leaves += l;
    if (out_num_leaves) *out_num_leaves = leaves;
    if (out_depth) *out_depth = B.depth;
    if (out_root_code) *out_root_code = B.rows_is_leaf[0] ? ~int64_t(0) : 0;
    return static_cast<int64_t>(B.rows_is_leaf.size());
}

// Phase 2: emit the packed table from the cached build.
int sah_build3(const float* v0, const float* v1, const float* v2,
               int64_t num_tris, int64_t leaf_size,
               float* table, int64_t num_rows) {
    if (!g_builder) return 1;
    Builder& B = *g_builder;
    if (num_rows != static_cast<int64_t>(B.rows_is_leaf.size())) return 2;
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);

    std::memset(table, 0, sizeof(float) * static_cast<size_t>(num_rows * kRecord));
    const int32_t none = -1;
    for (int64_t rid = 0; rid < num_rows; ++rid) {
        float* rec = table + rid * kRecord;
        if (B.rows_is_leaf[rid]) {
            for (int slot = 0; slot < kLeafSize; ++slot)
                std::memcpy(rec + 9 * kLeafSize + slot, &none, 4);
            int64_t slot = 0;
            for (int64_t i = B.rows_range_lo[rid]; i < B.rows_range_hi[rid]; ++i, ++slot) {
                const int64_t t = B.order[i];
                rec[0 * kLeafSize + slot] = a[t].x;
                rec[1 * kLeafSize + slot] = a[t].y;
                rec[2 * kLeafSize + slot] = a[t].z;
                rec[3 * kLeafSize + slot] = b[t].x - a[t].x;
                rec[4 * kLeafSize + slot] = b[t].y - a[t].y;
                rec[5 * kLeafSize + slot] = b[t].z - a[t].z;
                rec[6 * kLeafSize + slot] = c[t].x - a[t].x;
                rec[7 * kLeafSize + slot] = c[t].y - a[t].y;
                rec[8 * kLeafSize + slot] = c[t].z - a[t].z;
                const int32_t tid = static_cast<int32_t>(t);
                std::memcpy(rec + 9 * kLeafSize + slot, &tid, 4);
            }
        } else {
            for (int k = 0; k < kWidth; ++k) {
                const int64_t ch = B.rows_child[rid][k];
                if (ch < 0) {
                    // empty slot: inverted bounds never hit; code 0
                    rec[0 + k] = 3e38f;
                    rec[8 + k] = 3e38f;
                    rec[16 + k] = 3e38f;
                    rec[24 + k] = -3e38f;
                    rec[32 + k] = -3e38f;
                    rec[40 + k] = -3e38f;
                    continue;
                }
                rec[0 + k] = B.rows_box[ch].lo.x;
                rec[8 + k] = B.rows_box[ch].lo.y;
                rec[16 + k] = B.rows_box[ch].lo.z;
                rec[24 + k] = B.rows_box[ch].hi.x;
                rec[32 + k] = B.rows_box[ch].hi.y;
                rec[40 + k] = B.rows_box[ch].hi.z;
                const int32_t code = B.rows_is_leaf[ch]
                    ? static_cast<int32_t>(~ch) : static_cast<int32_t>(ch);
                std::memcpy(rec + 48 + k, &code, 4);
            }
        }
    }
    delete g_builder;
    g_builder = nullptr;
    return 0;
}

// --- Wide bf16-internal emission --------------------------------------------
// Same phase-1 build collapsed to `width` (16/32) children; emits the
// lbvh.build_table_numpy_sah_wide unified layout: bf16 child AABBs with
// conservative DIRECTED rounding (lo toward -inf, hi toward +inf) packed in
// pairs at slots [0, 3W), int32 child codes at [3W, 4W), leaves unchanged.
// Kept bit-identical with the numpy emitter (tests/test_native.py).

namespace {
inline uint16_t bf16_dir(float x, bool up) {
    uint32_t b;
    std::memcpy(&b, &x, 4);
    uint32_t hi16 = b >> 16;
    const bool rem = (b & 0xFFFFu) != 0;
    const bool neg = (b >> 31) != 0;
    if (rem && (up ? !neg : neg)) ++hi16;
    return static_cast<uint16_t>(hi16);
}
}  // namespace

// Phase 1: full build at `width`. Returns row count (or -1 on bad width).
int64_t sah_count_wide3(const float* v0, const float* v1, const float* v2,
                        int64_t num_tris, int64_t leaf_size, int64_t width,
                        int64_t* out_num_leaves, int64_t* out_depth,
                        int64_t* out_root_code) {
    if (width != 16 && width != 32) return -1;
    delete g_builder;
    g_builder = new Builder();
    Builder& B = *g_builder;
    B.leaf_size = leaf_size;
    B.width = static_cast<int>(width);
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);
    B.tlo.resize(num_tris);
    B.thi.resize(num_tris);
    B.cent.resize(num_tris);
    B.order.resize(num_tris);
    for (int64_t i = 0; i < num_tris; ++i) {
        B.tlo[i] = vmin(vmin(a[i], b[i]), c[i]);
        B.thi[i] = vmax(vmax(a[i], b[i]), c[i]);
        B.cent[i] = {(a[i].x + b[i].x + c[i].x) / 3.0f,
                     (a[i].y + b[i].y + c[i].y) / 3.0f,
                     (a[i].z + b[i].z + c[i].z) / 3.0f};
        B.order[i] = i;
    }
    B.bnodes.reserve(2 * static_cast<size_t>(num_tris) / std::max<int64_t>(leaf_size, 1) + 16);
    const int64_t broot = B.build_binary(0, num_tris);
    B.collapse(broot);

    int64_t leaves = 0;
    for (bool l : B.rows_is_leaf) leaves += l;
    if (out_num_leaves) *out_num_leaves = leaves;
    if (out_depth) *out_depth = B.depth;
    if (out_root_code) *out_root_code = B.rows_is_leaf[0] ? ~int64_t(0) : 0;
    return static_cast<int64_t>(B.rows_is_leaf.size());
}

// Phase 2: emit the packed wide table from the cached build.
int sah_build_wide3(const float* v0, const float* v1, const float* v2,
                    int64_t num_tris, int64_t leaf_size, int64_t width,
                    float* table, int64_t num_rows) {
    if (!g_builder) return 1;
    Builder& B = *g_builder;
    if (num_rows != static_cast<int64_t>(B.rows_is_leaf.size())) return 2;
    if (B.width != static_cast<int>(width)) return 3;
    const int W = B.width;
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);

    std::memset(table, 0, sizeof(float) * static_cast<size_t>(num_rows * kRecord));
    const int32_t none = -1;
    for (int64_t rid = 0; rid < num_rows; ++rid) {
        float* rec = table + rid * kRecord;
        if (B.rows_is_leaf[rid]) {
            for (int slot = 0; slot < kLeafSize; ++slot)
                std::memcpy(rec + 9 * kLeafSize + slot, &none, 4);
            int64_t slot = 0;
            for (int64_t i = B.rows_range_lo[rid]; i < B.rows_range_hi[rid]; ++i, ++slot) {
                const int64_t t = B.order[i];
                rec[0 * kLeafSize + slot] = a[t].x;
                rec[1 * kLeafSize + slot] = a[t].y;
                rec[2 * kLeafSize + slot] = a[t].z;
                rec[3 * kLeafSize + slot] = b[t].x - a[t].x;
                rec[4 * kLeafSize + slot] = b[t].y - a[t].y;
                rec[5 * kLeafSize + slot] = b[t].z - a[t].z;
                rec[6 * kLeafSize + slot] = c[t].x - a[t].x;
                rec[7 * kLeafSize + slot] = c[t].y - a[t].y;
                rec[8 * kLeafSize + slot] = c[t].z - a[t].z;
                const int32_t tid = static_cast<int32_t>(t);
                std::memcpy(rec + 9 * kLeafSize + slot, &tid, 4);
            }
        } else {
            uint16_t v16[6][kMaxWidth];
            int32_t codes[kMaxWidth];
            for (int k = 0; k < W; ++k) {
                float clo[3] = {3e38f, 3e38f, 3e38f};
                float chi[3] = {-3e38f, -3e38f, -3e38f};
                codes[k] = 0;
                const int64_t ch = B.rows_child[rid][k];
                if (ch >= 0) {
                    const Aabb& box = B.rows_box[ch];
                    clo[0] = box.lo.x; clo[1] = box.lo.y; clo[2] = box.lo.z;
                    chi[0] = box.hi.x; chi[1] = box.hi.y; chi[2] = box.hi.z;
                    codes[k] = B.rows_is_leaf[ch]
                        ? static_cast<int32_t>(~ch) : static_cast<int32_t>(ch);
                }
                for (int ax = 0; ax < 3; ++ax) {
                    v16[ax][k] = bf16_dir(clo[ax], false);
                    v16[3 + ax][k] = bf16_dir(chi[ax], true);
                }
            }
            // de-interleaved pairs: slot j = (child j low, child j+H high) —
            // lets the traversal decode each half with integer ops only
            const int H = W / 2;
            for (int f = 0; f < 6; ++f) {
                for (int j = 0; j < H; ++j) {
                    const uint32_t packed =
                        static_cast<uint32_t>(v16[f][j])
                        | (static_cast<uint32_t>(v16[f][j + H]) << 16);
                    std::memcpy(rec + f * H + j, &packed, 4);
                }
            }
            std::memcpy(rec + 3 * W, codes, sizeof(int32_t) * W);
        }
    }
    delete g_builder;
    g_builder = nullptr;
    return 0;
}

// --- Split-table (MXU fat-leaf) emission -----------------------------------
// Same phase-1 build; emits the accel/lbvh.py SplitBVH layout: (I, 64)
// internal records and (NL, 10*L+8) anchored SoA leaf records. Kept
// bit-identical with build_split_tables_numpy_sah (anchor = (lo+hi)*0.5f in
// f32, leaf-local v0' = v0 - anchor, -ffp-contract=off).

// Phase 1: build + renumber. Returns 0 on success.
int sah_count_split3(const float* v0, const float* v1, const float* v2,
                     int64_t num_tris, int64_t leaf_size,
                     int64_t* out_num_int, int64_t* out_num_leaves,
                     int64_t* out_depth, int64_t* out_root_code) {
    int64_t leaves = 0, depth = 0, root = 0;
    sah_count3(v0, v1, v2, num_tris, leaf_size, &leaves, &depth, &root);
    Builder& B = *g_builder;
    const int64_t n_rows = static_cast<int64_t>(B.rows_is_leaf.size());
    int64_t ni = 0, nl = 0;
    B.wide_of_bnode.assign(n_rows, -1);  // reuse as renumber scratch: int idx
    std::vector<int64_t> leaf_idx(n_rows, -1);
    for (int64_t rid = 0; rid < n_rows; ++rid) {
        if (B.rows_is_leaf[rid]) leaf_idx[rid] = nl++;
        else B.wide_of_bnode[rid] = ni++;
    }
    B.rows_range_lo.reserve(B.rows_range_lo.size());  // no-op; keep state
    B.leaf_renumber = std::move(leaf_idx);
    if (out_num_int) *out_num_int = ni;
    if (out_num_leaves) *out_num_leaves = nl;
    if (out_depth) *out_depth = B.depth;
    if (out_root_code)
        *out_root_code = B.rows_is_leaf[0]
            ? ~B.leaf_renumber[0] : B.wide_of_bnode[0];
    return 0;
}

// Phase 2: emit both tables from the cached build.
int sah_build_split3(const float* v0, const float* v1, const float* v2,
                     int64_t num_tris, int64_t leaf_size,
                     float* int_table, int64_t num_int,
                     float* leaf_table, int64_t num_leaves) {
    if (!g_builder) return 1;
    Builder& B = *g_builder;
    const int64_t n_rows = static_cast<int64_t>(B.rows_is_leaf.size());
    const int64_t L = leaf_size;
    const int64_t int_row = 64;
    const int64_t leaf_row = 10 * L + 8;
    const Vec3* a = reinterpret_cast<const Vec3*>(v0);
    const Vec3* b = reinterpret_cast<const Vec3*>(v1);
    const Vec3* c = reinterpret_cast<const Vec3*>(v2);

    std::memset(int_table, 0,
                sizeof(float) * static_cast<size_t>(num_int * int_row));
    std::memset(leaf_table, 0,
                sizeof(float) * static_cast<size_t>(num_leaves * leaf_row));
    const int32_t none = -1;

    for (int64_t rid = 0; rid < n_rows; ++rid) {
        if (B.rows_is_leaf[rid]) {
            const int64_t li = B.leaf_renumber[rid];
            if (li < 0 || li >= num_leaves) return 2;
            float* rec = leaf_table + li * leaf_row;
            for (int64_t slot = 0; slot < L; ++slot)
                std::memcpy(rec + 9 * L + slot, &none, 4);
            const Aabb& box = B.rows_box[rid];
            const float ax = (box.lo.x + box.hi.x) * 0.5f;
            const float ay = (box.lo.y + box.hi.y) * 0.5f;
            const float az = (box.lo.z + box.hi.z) * 0.5f;
            rec[10 * L + 0] = ax;
            rec[10 * L + 1] = ay;
            rec[10 * L + 2] = az;
            int64_t slot = 0;
            for (int64_t i = B.rows_range_lo[rid]; i < B.rows_range_hi[rid];
                 ++i, ++slot) {
                const int64_t t = B.order[i];
                rec[0 * L + slot] = a[t].x - ax;
                rec[1 * L + slot] = a[t].y - ay;
                rec[2 * L + slot] = a[t].z - az;
                rec[3 * L + slot] = b[t].x - a[t].x;
                rec[4 * L + slot] = b[t].y - a[t].y;
                rec[5 * L + slot] = b[t].z - a[t].z;
                rec[6 * L + slot] = c[t].x - a[t].x;
                rec[7 * L + slot] = c[t].y - a[t].y;
                rec[8 * L + slot] = c[t].z - a[t].z;
                const int32_t tid = static_cast<int32_t>(t);
                std::memcpy(rec + 9 * L + slot, &tid, 4);
            }
        } else {
            const int64_t ii = B.wide_of_bnode[rid];
            if (ii < 0 || ii >= num_int) return 3;
            float* rec = int_table + ii * int_row;
            for (int k = 0; k < kWidth; ++k) {
                const int64_t ch = B.rows_child[rid][k];
                if (ch < 0) {
                    rec[0 + k] = 3e38f;
                    rec[8 + k] = 3e38f;
                    rec[16 + k] = 3e38f;
                    rec[24 + k] = -3e38f;
                    rec[32 + k] = -3e38f;
                    rec[40 + k] = -3e38f;
                    continue;
                }
                rec[0 + k] = B.rows_box[ch].lo.x;
                rec[8 + k] = B.rows_box[ch].lo.y;
                rec[16 + k] = B.rows_box[ch].lo.z;
                rec[24 + k] = B.rows_box[ch].hi.x;
                rec[32 + k] = B.rows_box[ch].hi.y;
                rec[40 + k] = B.rows_box[ch].hi.z;
                const int32_t code = B.rows_is_leaf[ch]
                    ? static_cast<int32_t>(~B.leaf_renumber[ch])
                    : static_cast<int32_t>(B.wide_of_bnode[ch]);
                std::memcpy(rec + 48 + k, &code, 4);
            }
        }
    }
    delete g_builder;
    g_builder = nullptr;
    return 0;
}

}  // extern "C"
