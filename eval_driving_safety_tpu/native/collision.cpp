// Oriented-bounding-box collision core (C++, ctypes ABI).
//
// TPU-native replacement for the pycrcc C++ collision checker the reference
// uses downstream (/root/reference/evaluation/check_collision.py:27-29,83-88):
// the ego trajectory (a sequence of timestamped OBBs) is tested against the
// scenario's static OBBs (any time step) and dynamic OBB states
// (time-step-aligned), exactly the semantics of
// create_collision_checker(scenario).collide(ego_trajectory_object).
//
// 2D separating-axis test on the 4 edge normals of the two rectangles.
// Data sizes are tiny (<= ~30 obstacles x ~40 steps) but this sits inside
// the per-scenario evaluation loop over hundreds of scenarios, so it is
// native like the reference's.
//
// Build: g++ -O3 -shared -fPIC collision.cpp -o libcollision.so

#include <cmath>
#include <cstdint>

namespace {

struct OBB {
    double cx, cy, c, s, hl, hw;  // center, cos/sin(orient), half length/width
};

inline OBB make_obb(const double* row) {
    // row: cx, cy, orient, length, width
    OBB b;
    b.cx = row[0];
    b.cy = row[1];
    b.c = std::cos(row[2]);
    b.s = std::sin(row[2]);
    b.hl = 0.5 * row[3];
    b.hw = 0.5 * row[4];
    return b;
}

// Project b's extent onto axis (ax, ay) and test the center-distance.
inline bool axis_separates(const OBB& a, const OBB& b, double ax, double ay) {
    const double dx = b.cx - a.cx;
    const double dy = b.cy - a.cy;
    const double dist = std::fabs(dx * ax + dy * ay);
    const double ra = a.hl * std::fabs(ax * a.c + ay * a.s)
                    + a.hw * std::fabs(-ax * a.s + ay * a.c);
    const double rb = b.hl * std::fabs(ax * b.c + ay * b.s)
                    + b.hw * std::fabs(-ax * b.s + ay * b.c);
    return dist > ra + rb;
}

inline bool obb_overlap(const OBB& a, const OBB& b) {
    return !(axis_separates(a, b, a.c, a.s)
             || axis_separates(a, b, -a.s, a.c)
             || axis_separates(a, b, b.c, b.s)
             || axis_separates(a, b, -b.s, b.c));
}

}  // namespace

extern "C" {

// Single pair test. Rows: cx, cy, orient, length, width.
int obb_intersect(const double* a, const double* b) {
    return obb_overlap(make_obb(a), make_obb(b)) ? 1 : 0;
}

// Ego trajectory vs scenario.
//   ego : n_ego x 6 rows (t, cx, cy, orient, length, width)
//   stat: n_stat x 5 rows (cx, cy, orient, length, width)
//   dyn : n_dyn x 6 rows (t, cx, cy, orient, length, width) — the states of
//         all dynamic obstacles flattened; matched to ego states by t.
// Returns the 0-based index of the first colliding ego state, or -1.
int trajectory_first_collision(const double* ego, int n_ego,
                               const double* stat, int n_stat,
                               const double* dyn, int n_dyn) {
    for (int i = 0; i < n_ego; ++i) {
        const double t = ego[i * 6];
        const OBB e = make_obb(ego + i * 6 + 1);
        for (int j = 0; j < n_stat; ++j) {
            if (obb_overlap(e, make_obb(stat + j * 5))) return i;
        }
        for (int j = 0; j < n_dyn; ++j) {
            if (dyn[j * 6] == t
                && obb_overlap(e, make_obb(dyn + j * 6 + 1))) return i;
        }
    }
    return -1;
}

// Batch: n_traj ego trajectories (same length) against one scenario.
// out[k] = first colliding state index or -1.
void batch_trajectory_collisions(const double* egos, int n_traj, int n_ego,
                                 const double* stat, int n_stat,
                                 const double* dyn, int n_dyn,
                                 int32_t* out) {
    for (int k = 0; k < n_traj; ++k) {
        out[k] = trajectory_first_collision(
            egos + (int64_t)k * n_ego * 6, n_ego, stat, n_stat, dyn, n_dyn);
    }
}

}  // extern "C"
