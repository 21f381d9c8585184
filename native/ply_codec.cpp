// Native PLY row codec: interleave / deinterleave Gaussian-map attribute
// arrays into the reference's PLY vertex-row layout
//   x y z nx ny nz f_dc_{0..3*DC-1} f_rest_{0..3*FR-1} opacity
//   scale_{0..2} rot_{0..3} rgb_{0..2}
// (gaussian_model.py:205-257). One multithreaded pass instead of the
// numpy transpose+concatenate chain — the host-side hot spot when
// checkpointing million-row maps.
//
// Built as a plain shared library (no pybind11 in this image); Python binds
// via ctypes with a numpy fallback (models/ply_io.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Layout {
    int64_t dc_cols;    // 3 * DC SH coefficients
    int64_t fr_cols;    // 3 * rest SH coefficients
    int64_t stride;     // total floats per row
};

inline Layout make_layout(int64_t dc_cols, int64_t fr_cols) {
    // 3 xyz + 3 normals + dc + rest + 1 opacity + 3 scale + 4 rot + 3 rgb
    return Layout{dc_cols, fr_cols, 3 + 3 + dc_cols + fr_cols + 1 + 3 + 4 + 3};
}

template <typename F>
void parallel_rows(int64_t n, F&& fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int64_t n_threads = hw ? (hw < 16 ? hw : 16) : 4;
    if (n < 4096) n_threads = 1;
    std::vector<std::thread> ts;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk;
        int64_t hi = lo + chunk < n ? lo + chunk : n;
        if (lo >= hi) break;
        ts.emplace_back([=]() { fn(lo, hi); });
    }
    for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// All inputs are contiguous float32. f_dc is [n, DC, 3] and f_rest is
// [n, FR, 3] in memory; the PLY stores them channel-major (f_dc_{c*DC+k}),
// matching the reference's .transpose(1, 2).flatten(1).
void ply_pack_rows(int64_t n, int64_t dc, int64_t fr,
                   const float* xyz, const float* f_dc, const float* f_rest,
                   const float* opacity, const float* scaling,
                   const float* rotation, const float* rgb, float* out) {
    const Layout L = make_layout(3 * dc, 3 * fr);
    parallel_rows(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            float* row = out + i * L.stride;
            const float* p = xyz + i * 3;
            row[0] = p[0]; row[1] = p[1]; row[2] = p[2];
            row[3] = row[4] = row[5] = 0.0f;  // normals
            float* w = row + 6;
            // channel-major: out[c*DC + k] = f_dc[i, k, c]
            const float* d = f_dc + i * dc * 3;
            for (int64_t c = 0; c < 3; ++c)
                for (int64_t k = 0; k < dc; ++k)
                    *w++ = d[k * 3 + c];
            const float* r = f_rest + i * fr * 3;
            for (int64_t c = 0; c < 3; ++c)
                for (int64_t k = 0; k < fr; ++k)
                    *w++ = r[k * 3 + c];
            *w++ = opacity[i];
            const float* s = scaling + i * 3;
            *w++ = s[0]; *w++ = s[1]; *w++ = s[2];
            const float* q = rotation + i * 4;
            *w++ = q[0]; *w++ = q[1]; *w++ = q[2]; *w++ = q[3];
            const float* g = rgb + i * 3;
            *w++ = g[0]; *w++ = g[1]; *w++ = g[2];
        }
    });
}

void ply_unpack_rows(int64_t n, int64_t dc, int64_t fr, const float* rows,
                     float* xyz, float* f_dc, float* f_rest, float* opacity,
                     float* scaling, float* rotation, float* rgb) {
    const Layout L = make_layout(3 * dc, 3 * fr);
    parallel_rows(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const float* row = rows + i * L.stride;
            float* p = xyz + i * 3;
            p[0] = row[0]; p[1] = row[1]; p[2] = row[2];
            const float* w = row + 6;
            float* d = f_dc + i * dc * 3;
            for (int64_t c = 0; c < 3; ++c)
                for (int64_t k = 0; k < dc; ++k)
                    d[k * 3 + c] = *w++;
            float* r = f_rest + i * fr * 3;
            for (int64_t c = 0; c < 3; ++c)
                for (int64_t k = 0; k < fr; ++k)
                    r[k * 3 + c] = *w++;
            opacity[i] = *w++;
            float* s = scaling + i * 3;
            s[0] = *w++; s[1] = *w++; s[2] = *w++;
            float* q = rotation + i * 4;
            q[0] = *w++; q[1] = *w++; q[2] = *w++; q[3] = *w++;
            float* g = rgb + i * 3;
            g[0] = *w++; g[1] = *w++; g[2] = *w++;
        }
    });
}

int64_t ply_row_stride(int64_t dc, int64_t fr) {
    return make_layout(3 * dc, 3 * fr).stride;
}

}  // extern "C"
