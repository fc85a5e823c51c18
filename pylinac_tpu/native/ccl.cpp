// Host-native connected-component labeling + region property sums.
//
// Serves the CT localization family (pylinac_tpu/ct.py get_regions paths),
// where every consumer is host-side anyway: the device computes the edge
// mask (Scharr->Gaussian->Otsu, bit-identical to the pallas/XLA route) and
// ships ONE bit-packed buffer over the wire; this file turns that buffer
// into exact per-region properties. Union-find over row runs is O(pixels
// scanned / 64) + O(runs): a 240-slice pooled CT localization batch labels
// in ~10 ms single-core, vs ~400 ms for the iterative on-device
// min-propagation + one-hot matmul reductions it replaces (the TPU is the
// wrong tool for a sequential graph pass whose output is read by the host).
//
// Semantics match pylinac_tpu/ops/label.py exactly (which in turn mirrors
// skimage.measure.label/regionprops used by the reference at
// /root/reference/pylinac/ct.py:3315):
//   * components carry their minimum linear pixel index as the label id,
//   * slots are ordered by ascending label id,
//   * holes = 4-connected background components not touching the border,
//     assigned to the region directly above their topmost-leftmost pixel,
//   * bbox is half-open like skimage.
//
// Input mask format: uint16 halfwords, LSB-first (bit j of word k covers
// column k*16+j), W padded up to a multiple of 16 with zero bits. The
// halfword layout is chosen because the device packs the mask into exact
// float32 integers (<= 65535) for the transfer — some transports move
// float32 in bulk but integers element-wise.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

namespace {

struct RunUF {
    // parent pointers over run ids; the root of every set is the run with
    // the smallest start index (runs are created in scan order, so "min
    // start" == "min linear pixel index of the component")
    std::vector<int32_t> parent;

    int32_t add() {
        parent.push_back((int32_t)parent.size());
        return (int32_t)parent.size() - 1;
    }

    int32_t find(int32_t x) {
        int32_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) {
            int32_t next = parent[x];
            parent[x] = root;
            x = next;
        }
        return root;
    }

    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a == b) return;
        // attach the larger-id root under the smaller-id root: run ids are
        // in scan order, so the set root keeps the min linear index
        if (a < b) parent[b] = a; else parent[a] = b;
    }
};

struct Run {
    int32_t row, c0, c1;  // [c0, c1) on `row`
};

// extract set-bit runs of `bits` (W64 words) into `runs`, unioning with
// the previous row's runs under `conn` (1 = 4-conn, 2 = 8-conn)
inline void scan_row(const uint64_t* bits, int w64, int row, int conn,
                     std::vector<Run>& runs, RunUF& uf,
                     int32_t prev_begin, int32_t prev_end,
                     int32_t& out_begin, int32_t& out_end) {
    out_begin = (int32_t)runs.size();
    int32_t p = prev_begin;  // two-pointer merge against the previous row
    int c = 0;
    const int wbits = w64 * 64;
    while (c < wbits) {
        // find next set bit at or after c
        int word = c >> 6, off = c & 63;
        uint64_t v = bits[word] & (~0ULL << off);
        while (v == 0) {
            ++word;
            if (word >= w64) { c = wbits; break; }
            v = bits[word];
        }
        if (c >= wbits) break;
        int start = (word << 6) + __builtin_ctzll(v);
        // find next clear bit after start
        word = start >> 6; off = start & 63;
        uint64_t inv = ~bits[word] & (~0ULL << off);
        while (inv == 0) {
            ++word;
            if (word >= w64) break;
            inv = ~bits[word];
        }
        int end = (word >= w64) ? wbits : ((word << 6) + __builtin_ctzll(inv));
        int32_t id = uf.add();
        runs.push_back({row, start, end});
        // union with overlapping previous-row runs; 8-conn counts diagonal
        // contact, widening the overlap window by one on each side
        const int lo = (conn == 2) ? start - 1 : start;
        const int hi = (conn == 2) ? end + 1 : end;
        while (p < prev_end && runs[p].c1 <= lo) ++p;
        int32_t q = p;
        while (q < prev_end && runs[q].c0 < hi) {
            uf.unite(id, q);
            ++q;
        }
        c = end + 1;  // a clear bit separates runs
    }
    out_end = (int32_t)runs.size();
}

struct Comp {
    int32_t label;  // min linear pixel index
    int32_t slot;
};

}  // namespace

extern "C" {

// Per-image outputs are written at [img*K + slot]. Returns 0.
// n_regions[img] reports the TRUE component count (callers re-invoke with a
// larger K when it exceeds K — no silent truncation).
//
// sums layout (B*K*10 doubles): area, sr, sc, srr, scc, src, hole_area,
//                               si, sri, sci
// minmax layout (B*K*2 floats): min_i, max_i (only when intensity != null)
int ccl_props_batch(
    const uint16_t* bits, int B, int H, int W, int Wwords,
    const float* intensity,   // B*H*W row-major, or null
    int connectivity, int K,
    double* sums, int32_t* bbox, uint8_t* touches, float* minmax,
    int32_t* label_id, uint8_t* valid, int32_t* n_regions) {
    const int w64 = (Wwords + 3) / 4;              // 4 halfwords per u64
    std::vector<uint64_t> fg((size_t)H * w64), bg((size_t)H * w64);
    std::vector<int32_t> runid_img((size_t)H * W);
    std::vector<Run> runs, bruns;
    std::vector<int32_t> broot_area, hole_of;

    // pad-bit mask for the last u64 of each row: valid columns < W
    std::vector<uint64_t> colmask(w64, ~0ULL);
    {
        int valid_bits = W;
        for (int k = 0; k < w64; ++k) {
            int lo = k * 64;
            if (valid_bits <= lo) colmask[k] = 0;
            else if (valid_bits < lo + 64)
                colmask[k] = (~0ULL) >> (64 - (valid_bits - lo));
        }
    }

    for (int img = 0; img < B; ++img) {
        const uint16_t* src = bits + (size_t)img * H * Wwords;
        // assemble u64 rows; complement (within valid columns) for holes
        for (int r = 0; r < H; ++r) {
            for (int k = 0; k < w64; ++k) {
                uint64_t v = 0;
                for (int j = 0; j < 4; ++j) {
                    int hw = k * 4 + j;
                    if (hw < Wwords)
                        v |= (uint64_t)src[(size_t)r * Wwords + hw] << (16 * j);
                }
                v &= colmask[k];
                fg[(size_t)r * w64 + k] = v;
                bg[(size_t)r * w64 + k] = ~v & colmask[k];
            }
        }

        // ---- foreground CCL ------------------------------------------------
        runs.clear();
        RunUF uf;
        int32_t pb = 0, pe = 0;
        for (int r = 0; r < H; ++r) {
            int32_t nb, ne;
            scan_row(&fg[(size_t)r * w64], w64, r, connectivity,
                     runs, uf, pb, pe, nb, ne);
            pb = nb; pe = ne;
        }
        // run-id image (only fg pixels written; bg read as -1)
        std::fill(runid_img.begin(), runid_img.end(), -1);
        for (int32_t i = 0; i < (int32_t)runs.size(); ++i) {
            int32_t* row = runid_img.data() + (size_t)runs[i].row * W;
            for (int c = runs[i].c0; c < runs[i].c1; ++c) row[c] = i;
        }

        // ---- background CCL (always 4-conn) --------------------------------
        bruns.clear();
        RunUF buf_;
        pb = pe = 0;
        for (int r = 0; r < H; ++r) {
            int32_t nb, ne;
            scan_row(&bg[(size_t)r * w64], w64, r, 1, bruns, buf_, pb, pe, nb, ne);
            pb = nb; pe = ne;
        }
        // bg set area + border contact, keyed by bg root run
        broot_area.assign(bruns.size(), 0);
        std::vector<uint8_t> bborder(bruns.size(), 0);
        for (int32_t i = 0; i < (int32_t)bruns.size(); ++i) {
            int32_t rt = buf_.find(i);
            broot_area[rt] += bruns[i].c1 - bruns[i].c0;
            if (bruns[i].row == 0 || bruns[i].row == H - 1 ||
                bruns[i].c0 == 0 || bruns[i].c1 == W)
                bborder[rt] = 1;
        }
        // holes -> enclosing fg root (the run above the hole's root pixel;
        // see ops/label.py _props_from_label for why that pixel is fg)
        hole_of.assign(runs.size(), -1);  // reused as fg-root hole areas below
        std::vector<double> hole_area(runs.size(), 0.0);
        for (int32_t i = 0; i < (int32_t)bruns.size(); ++i) {
            if (buf_.find(i) != i || bborder[i]) continue;  // not a hole root
            int rr = bruns[i].row, cc = bruns[i].c0;
            if (rr == 0) continue;  // touches border anyway (defensive)
            int32_t above = runid_img[(size_t)(rr - 1) * W + cc];
            if (above < 0) continue;  // cannot happen; defensive
            hole_area[uf.find(above)] += broot_area[i];
        }

        // ---- per-component accumulation ------------------------------------
        // component root run -> slot, ordered by min linear index
        std::vector<Comp> comps;
        for (int32_t i = 0; i < (int32_t)runs.size(); ++i)
            if (uf.find(i) == i)
                comps.push_back({runs[i].row * W + runs[i].c0, i});
        std::sort(comps.begin(), comps.end(),
                  [](const Comp& a, const Comp& b) { return a.label < b.label; });
        n_regions[img] = (int32_t)comps.size();
        const int nslots = std::min((int)comps.size(), K);
        std::vector<int32_t> slot_of(runs.size(), -1);
        for (int s = 0; s < nslots; ++s) slot_of[comps[s].slot] = s;

        double* S = sums + (size_t)img * K * 10;
        int32_t* BB = bbox + (size_t)img * K * 4;
        std::memset(S, 0, sizeof(double) * K * 10);
        for (int s = 0; s < K; ++s) {
            BB[s * 4 + 0] = BB[s * 4 + 1] = INT32_MAX;
            BB[s * 4 + 2] = BB[s * 4 + 3] = INT32_MIN;
            touches[(size_t)img * K + s] = 0;
            valid[(size_t)img * K + s] = s < nslots;
            label_id[(size_t)img * K + s] = s < nslots ? comps[s].label : -1;
            if (minmax) {
                minmax[((size_t)img * K + s) * 2 + 0] = INFINITY;
                minmax[((size_t)img * K + s) * 2 + 1] = -INFINITY;
            }
        }
        for (int s = 0; s < nslots; ++s)
            S[s * 10 + 6] = hole_area[comps[s].slot];

        for (int32_t i = 0; i < (int32_t)runs.size(); ++i) {
            int32_t s = slot_of[uf.find(i)];
            if (s < 0) continue;
            const double r = runs[i].row;
            const double a = runs[i].c0, b = runs[i].c1;  // [a, b)
            const double n = b - a;
            // closed forms for sum(c), sum(c^2) over the run
            const double sc = (a + b - 1.0) * n / 2.0;
            auto f = [](double m) { return m * (m + 1.0) * (2.0 * m + 1.0) / 6.0; };
            const double scc = f(b - 1.0) - f(a - 1.0);
            double* row = S + (size_t)s * 10;
            row[0] += n;                       // area
            row[1] += r * n;                   // sum r
            row[2] += sc;                      // sum c
            row[3] += r * r * n;               // sum r^2
            row[4] += scc;                     // sum c^2
            row[5] += r * sc;                  // sum r*c
            int32_t* bb = BB + (size_t)s * 4;
            if (runs[i].row < bb[0]) bb[0] = runs[i].row;
            if (runs[i].c0 < bb[1]) bb[1] = runs[i].c0;
            if (runs[i].row + 1 > bb[2]) bb[2] = runs[i].row + 1;
            if (runs[i].c1 > bb[3]) bb[3] = runs[i].c1;
            if (runs[i].row == 0 || runs[i].row == H - 1 ||
                runs[i].c0 == 0 || runs[i].c1 == W)
                touches[(size_t)img * K + s] = 1;
            if (intensity) {
                const float* irow =
                    intensity + ((size_t)img * H + runs[i].row) * W;
                float mn = minmax[((size_t)img * K + s) * 2 + 0];
                float mx = minmax[((size_t)img * K + s) * 2 + 1];
                double si = 0, sci_ = 0;
                for (int c = runs[i].c0; c < runs[i].c1; ++c) {
                    const float v = irow[c];
                    si += v;
                    sci_ += v * (double)c;
                    if (v < mn) mn = v;
                    if (v > mx) mx = v;
                }
                row[7] += si;                  // sum i
                row[8] += r * si;              // sum r*i
                row[9] += sci_;                // sum c*i
                minmax[((size_t)img * K + s) * 2 + 0] = mn;
                minmax[((size_t)img * K + s) * 2 + 1] = mx;
            }
        }
    }
    return 0;
}

}  // extern "C"
