// Molecular surface extraction — native core of geom/surface.py.
//
// The Python pipeline (vdW field on a dense grid + vectorized marching
// tetrahedra) is the reference implementation and fallback; this module is
// the production data-loader path: preprocessing 1.6M molecules at the
// reference's scale is host-bound on exactly this function
// (reference: ~15 h GPU-assisted, ReadMe.md:44).
//
// Algorithm (identical geometry to the Python path, same 6-tet cube split):
//  1. field grid: f(x) = min_i(|x - pos_i| - (r_i + probe)), computed by
//     LOCALIZED sphere rasterization — each atom only touches voxels in its
//     own bounding cube, so cost is O(atoms * (r/h)^3) instead of
//     O(grid * atoms). Distant voxels keep a large positive value; every
//     neighbor of a negative voxel lies inside some atom's cube, so all
//     sign crossings interpolate on exact values.
//  2. marching tetrahedra over each cube's 6 tets, linear interpolation on
//     tet edges, vertex deduplication via a quantized-coordinate hash map.
//
// Exposed via ctypes (chem/native.py): surface_mesh().
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

const int CUBE[8][3] = {{0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
                        {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
const int TETS[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                        {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};

struct Key {
  int64_t x, y, z;
  bool operator==(const Key& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};
struct KeyHash {
  size_t operator()(const Key& k) const {
    return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349663LL ^
                               k.z * 83492791LL);
  }
};

struct Builder {
  std::unordered_map<Key, int, KeyHash> index;
  std::vector<double> verts;   // accumulated sums for averaging
  std::vector<int> counts;
  std::vector<int> faces;
  double quant;

  int vertex(double x, double y, double z) {
    Key k{static_cast<int64_t>(std::llround(x / quant)),
          static_cast<int64_t>(std::llround(y / quant)),
          static_cast<int64_t>(std::llround(z / quant))};
    auto it = index.find(k);
    if (it == index.end()) {
      int id = static_cast<int>(counts.size());
      index.emplace(k, id);
      verts.insert(verts.end(), {x, y, z});
      counts.push_back(1);
      return id;
    }
    int id = it->second;
    verts[3 * id] += x;
    verts[3 * id + 1] += y;
    verts[3 * id + 2] += z;
    counts[id] += 1;
    return id;
  }

  void tri(const double* a, const double* b, const double* c) {
    int ia = vertex(a[0], a[1], a[2]);
    int ib = vertex(b[0], b[1], b[2]);
    int ic = vertex(c[0], c[1], c[2]);
    if (ia == ib || ib == ic || ia == ic) return;  // degenerate
    faces.insert(faces.end(), {ia, ib, ic});
  }
};

inline void interp(const double* pa, double va, const double* pb, double vb,
                   double* out) {
  double t = va / (va - vb + 1e-30);
  for (int c = 0; c < 3; ++c) out[c] = pa[c] + t * (pb[c] - pa[c]);
}

}  // namespace

extern "C" {

// pos (n,3) row-major, radii (n,) ALREADY probe-inflated.
// Returns 0 on success. out_verts capacity max_v*3 doubles, out_faces
// capacity max_f*3 ints; n_v/n_f receive actual counts (returns 1 if the
// buffers were too small — caller retries with larger ones).
int surface_mesh(const double* pos, const double* radii, int n_atoms,
                 double spacing, double padding, double* out_verts,
                 int* out_faces, int max_v, int max_f, int* n_v, int* n_f) {
  if (n_atoms <= 0) return 2;
  double lo[3], hi[3];
  for (int c = 0; c < 3; ++c) {
    lo[c] = 1e30;
    hi[c] = -1e30;
  }
  for (int i = 0; i < n_atoms; ++i)
    for (int c = 0; c < 3; ++c) {
      lo[c] = std::min(lo[c], pos[3 * i + c]);
      hi[c] = std::max(hi[c], pos[3 * i + c]);
    }
  int ns[3];
  for (int c = 0; c < 3; ++c) {
    lo[c] -= padding;
    ns[c] = std::max(static_cast<int>(
                         std::ceil((hi[c] + padding - lo[c]) / spacing)) +
                         1,
                     2);
  }
  const double BIG = 1e6;
  std::vector<double> g(static_cast<size_t>(ns[0]) * ns[1] * ns[2], BIG);
  auto at = [&](int x, int y, int z) -> double& {
    return g[(static_cast<size_t>(x) * ns[1] + y) * ns[2] + z];
  };

  // localized min-update: every voxel within r + 2*spacing of an atom gets
  // the exact field value, so all voxels adjacent to a negative voxel are
  // exact (a negative voxel is inside some sphere)
  for (int i = 0; i < n_atoms; ++i) {
    const double* p = pos + 3 * i;
    double r = radii[i];
    double reach = r + 2.0 * spacing;
    int b0[3], b1[3];
    for (int c = 0; c < 3; ++c) {
      b0[c] = std::max(0, static_cast<int>((p[c] - reach - lo[c]) / spacing));
      b1[c] = std::min(ns[c] - 1,
                       static_cast<int>((p[c] + reach - lo[c]) / spacing) + 1);
    }
    for (int x = b0[0]; x <= b1[0]; ++x) {
      double dx = lo[0] + x * spacing - p[0];
      for (int y = b0[1]; y <= b1[1]; ++y) {
        double dy = lo[1] + y * spacing - p[1];
        for (int z = b0[2]; z <= b1[2]; ++z) {
          double dz = lo[2] + z * spacing - p[2];
          double v = std::sqrt(dx * dx + dy * dy + dz * dz) - r;
          double& cell = at(x, y, z);
          if (v < cell) cell = v;
        }
      }
    }
  }

  Builder b;
  b.quant = spacing * 1e-4;
  b.index.reserve(1 << 15);
  b.verts.reserve(3 << 15);
  b.faces.reserve(3 << 16);
  double corner_xyz[8][3], vals[8];
  for (int x = 0; x + 1 < ns[0]; ++x)
    for (int y = 0; y + 1 < ns[1]; ++y)
      for (int z = 0; z + 1 < ns[2]; ++z) {
        bool any_neg = false, any_pos = false;
        for (int k = 0; k < 8; ++k) {
          vals[k] = at(x + CUBE[k][0], y + CUBE[k][1], z + CUBE[k][2]);
          (vals[k] < 0 ? any_neg : any_pos) = true;
        }
        if (!any_neg || !any_pos) continue;
        for (int k = 0; k < 8; ++k) {
          corner_xyz[k][0] = lo[0] + (x + CUBE[k][0]) * spacing;
          corner_xyz[k][1] = lo[1] + (y + CUBE[k][1]) * spacing;
          corner_xyz[k][2] = lo[2] + (z + CUBE[k][2]) * spacing;
        }
        for (const auto& tet : TETS) {
          int neg[4], pos_i[4], nn = 0, np_ = 0;
          for (int e = 0; e < 4; ++e) {
            if (vals[tet[e]] < 0)
              neg[nn++] = tet[e];
            else
              pos_i[np_++] = tet[e];
          }
          if (nn == 0 || nn == 4) continue;
          double pA[3], pB[3], pC[3], pD[3];
          if (nn == 1 || nn == 3) {
            int lone = (nn == 1) ? neg[0] : pos_i[0];
            int* rest = (nn == 1) ? pos_i : neg;
            interp(corner_xyz[lone], vals[lone], corner_xyz[rest[0]],
                   vals[rest[0]], pA);
            interp(corner_xyz[lone], vals[lone], corner_xyz[rest[1]],
                   vals[rest[1]], pB);
            interp(corner_xyz[lone], vals[lone], corner_xyz[rest[2]],
                   vals[rest[2]], pC);
            b.tri(pA, pB, pC);
          } else {  // 2/2: quad split into two triangles
            interp(corner_xyz[neg[0]], vals[neg[0]], corner_xyz[pos_i[0]],
                   vals[pos_i[0]], pA);
            interp(corner_xyz[neg[0]], vals[neg[0]], corner_xyz[pos_i[1]],
                   vals[pos_i[1]], pB);
            interp(corner_xyz[neg[1]], vals[neg[1]], corner_xyz[pos_i[0]],
                   vals[pos_i[0]], pC);
            interp(corner_xyz[neg[1]], vals[neg[1]], corner_xyz[pos_i[1]],
                   vals[pos_i[1]], pD);
            b.tri(pA, pB, pD);
            b.tri(pA, pD, pC);
          }
        }
      }

  int nv = static_cast<int>(b.counts.size());
  int nf = static_cast<int>(b.faces.size() / 3);
  *n_v = nv;
  *n_f = nf;
  if (nv > max_v || nf > max_f) return 1;
  for (int i = 0; i < nv; ++i)
    for (int c = 0; c < 3; ++c)
      out_verts[3 * i + c] = b.verts[3 * i + c] / b.counts[i];
  std::memcpy(out_faces, b.faces.data(), sizeof(int) * 3 * nf);
  return 0;
}

}  // extern "C"
