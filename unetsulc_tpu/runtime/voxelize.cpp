// Native host-side voxelizer for the input pipeline.
//
// The reference pays per-item Python/torch costs to build dense volumes
// (ref dataset.py:72-88, SURVEY.md §3 hot loop #2). This kernel fuses the
// whole per-sample host path into one C++ pass:
//   1. optional 3x4 affine (the rotation augmentation) applied per point,
//      truncated toward zero like the reference's int cast
//      (ref dataset.py:318-326),
//   2. re-translation so min coords == 0 (ref dataset.py:40-41),
//   3. background fill of the label volume and zero fill of the occupancy
//      volume,
//   4. scatter (later-point-wins, torch index-assignment semantics).
//
// Built as a shared object via g++ (see runtime/__init__.py); bound with
// ctypes. Single-threaded by design: the host has one core per chip here
// and the pipeline overlaps this work with device compute via the
// prefetch thread.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <limits>

extern "C" {

// Returns the number of in-bounds points scattered.
// bck:    n x 3 int64 point coords (already translated to origin unless
//         affine != nullptr)
// affine: nullptr or 12 doubles (row-major 3x4 homogeneous transform)
// labels: n int32 label ids
// vol_in: sx*sy*sz floats (occupancy, written)
// vol_lb: sx*sy*sz int32 (labels, written; background fill)
int64_t unetsulc_voxelize(
    const int64_t* bck,
    const double* affine,
    const int32_t* labels,
    int64_t n,
    int64_t sx, int64_t sy, int64_t sz,
    int32_t background,
    float* vol_in,
    int32_t* vol_lb,
    int64_t* out_coords /* optional n x 3 buffer for transformed coords */)
{
    const int64_t vol = sx * sy * sz;
    std::memset(vol_in, 0, sizeof(float) * vol);
    std::fill(vol_lb, vol_lb + vol, background);

    // Pass 1 (affine only): transform + find min for re-translation.
    // Coordinates are produced with trunc-toward-zero to match the
    // reference's np int cast.
    int64_t minv[3] = {0, 0, 0};
    int64_t* tmp = out_coords;
    if (affine != nullptr) {
        minv[0] = minv[1] = minv[2] = std::numeric_limits<int64_t>::max();
        for (int64_t i = 0; i < n; ++i) {
            const double x = (double)bck[i * 3 + 0];
            const double y = (double)bck[i * 3 + 1];
            const double z = (double)bck[i * 3 + 2];
            for (int a = 0; a < 3; ++a) {
                const double v = affine[a * 4 + 0] * x + affine[a * 4 + 1] * y +
                                 affine[a * 4 + 2] * z + affine[a * 4 + 3];
                const int64_t iv = (int64_t)v;  // trunc toward zero
                tmp[i * 3 + a] = iv;
                minv[a] = std::min(minv[a], iv);
            }
        }
        if (n == 0) minv[0] = minv[1] = minv[2] = 0;
    }

    const int64_t* pts = (affine != nullptr) ? tmp : bck;
    int64_t scattered = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t x = pts[i * 3 + 0] - minv[0];
        const int64_t y = pts[i * 3 + 1] - minv[1];
        const int64_t z = pts[i * 3 + 2] - minv[2];
        if (x < 0 || y < 0 || z < 0 || x >= sx || y >= sy || z >= sz)
            continue;
        const int64_t off = (x * sy + y) * sz + z;
        vol_in[off] = 1.0f;
        vol_lb[off] = labels[i];
        ++scattered;
    }
    return scattered;
}

}  // extern "C"
