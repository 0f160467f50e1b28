// Native isosurface mesh extraction for TSDF volumes.
//
// Host-side C++ replacement for the reference's skimage marching_cubes_lewiner
// dependency (ref scenerf/data/utils/fusion.py:341, :368): extracts a
// triangle mesh of the `level` isosurface with per-vertex gradient normals.
// Uses a 6-tetrahedra cell decomposition (marching tetrahedra), which needs no
// 256-entry case table, produces a watertight surface, and dedups vertices via
// global edge keys. Exposed through a C ABI consumed by ctypes
// (scenerf_tpu/fusion/meshing.py).
//
// Build: g++ -O3 -shared -fPIC meshing.cpp -o libscenerf_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

struct MeshBuilder {
  std::vector<float> verts;   // xyz triples (voxel-grid coordinates)
  std::vector<int32_t> faces; // index triples
  std::unordered_map<uint64_t, int32_t> edge_cache;

  const float* vol;
  int nx, ny, nz;
  float level;

  inline float at(int x, int y, int z) const {
    return vol[(static_cast<size_t>(x) * ny + y) * nz + z];
  }

  inline float at_clamped(int x, int y, int z) const {
    x = x < 0 ? 0 : (x >= nx ? nx - 1 : x);
    y = y < 0 ? 0 : (y >= ny ? ny - 1 : y);
    z = z < 0 ? 0 : (z >= nz ? nz - 1 : z);
    return at(x, y, z);
  }

  // Unique id of a lattice point.
  inline uint64_t point_id(int x, int y, int z) const {
    return (static_cast<uint64_t>(x) * (ny + 1) + y) * (nz + 1) + z;
  }

  // Vertex on the edge between lattice corners a and b (interpolated).
  int32_t edge_vertex(const int a[3], const int b[3]) {
    uint64_t ia = point_id(a[0], a[1], a[2]);
    uint64_t ib = point_id(b[0], b[1], b[2]);
    // exact pair packing (point ids bounded by 2^42 for any realistic grid)
    uint64_t key = (ia < ib) ? ((ia << 42) | ib) : ((ib << 42) | ia);
    auto it = edge_cache.find(key);
    if (it != edge_cache.end()) return it->second;

    float va = at(a[0], a[1], a[2]);
    float vb = at(b[0], b[1], b[2]);
    float t = (std::fabs(vb - va) > 1e-12f) ? (level - va) / (vb - va) : 0.5f;
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    float px = a[0] + t * (b[0] - a[0]);
    float py = a[1] + t * (b[1] - a[1]);
    float pz = a[2] + t * (b[2] - a[2]);
    int32_t idx = static_cast<int32_t>(verts.size() / 3);
    verts.push_back(px);
    verts.push_back(py);
    verts.push_back(pz);
    edge_cache.emplace(key, idx);
    return idx;
  }

  void emit(int32_t i0, int32_t i1, int32_t i2) {
    if (i0 == i1 || i1 == i2 || i0 == i2) return;
    faces.push_back(i0);
    faces.push_back(i1);
    faces.push_back(i2);
  }

  // Process one tetrahedron given its 4 lattice corners.
  void do_tet(const int c[4][3]) {
    float v[4];
    int mask = 0;
    for (int i = 0; i < 4; i++) {
      v[i] = at(c[i][0], c[i][1], c[i][2]);
      if (v[i] < level) mask |= 1 << i;
    }
    if (mask == 0 || mask == 15) return;

    auto ev = [&](int i, int j) { return edge_vertex(c[i], c[j]); };

    // For a single "inside" corner i, the surface is the triangle on the three
    // edges leaving i; orientation fixed so winding is consistent with the
    // inside corner (then globally re-oriented by gradient normals).
    switch (mask) {
      case 1:  emit(ev(0, 1), ev(0, 2), ev(0, 3)); break;
      case 14: emit(ev(0, 2), ev(0, 1), ev(0, 3)); break;
      case 2:  emit(ev(1, 0), ev(1, 3), ev(1, 2)); break;
      case 13: emit(ev(1, 3), ev(1, 0), ev(1, 2)); break;
      case 4:  emit(ev(2, 0), ev(2, 1), ev(2, 3)); break;
      case 11: emit(ev(2, 1), ev(2, 0), ev(2, 3)); break;
      case 8:  emit(ev(3, 0), ev(3, 2), ev(3, 1)); break;
      case 7:  emit(ev(3, 2), ev(3, 0), ev(3, 1)); break;
      // two-in / two-out: quad split into two triangles
      case 3:  // corners 0,1 inside
        emit(ev(0, 2), ev(1, 2), ev(1, 3));
        emit(ev(0, 2), ev(1, 3), ev(0, 3));
        break;
      case 12:
        emit(ev(1, 2), ev(0, 2), ev(1, 3));
        emit(ev(1, 3), ev(0, 2), ev(0, 3));
        break;
      case 5:  // corners 0,2 inside
        emit(ev(0, 1), ev(2, 3), ev(2, 1));
        emit(ev(0, 1), ev(0, 3), ev(2, 3));
        break;
      case 10:
        emit(ev(2, 3), ev(0, 1), ev(2, 1));
        emit(ev(0, 3), ev(0, 1), ev(2, 3));
        break;
      case 6:  // corners 1,2 inside
        emit(ev(1, 0), ev(2, 0), ev(2, 3));
        emit(ev(1, 0), ev(2, 3), ev(1, 3));
        break;
      case 9:
        emit(ev(2, 0), ev(1, 0), ev(2, 3));
        emit(ev(1, 3), ev(2, 3), ev(1, 0));
        break;
    }
  }

  void run() {
    // 6-tet decomposition of the unit cube around the main diagonal 0-7
    // (corner bits = (x, y, z)): every tet contains both diagonal endpoints,
    // so each cube face is split along the diagonal touching corner 0 or 7 --
    // which is the same split the neighboring cube makes on its shared face
    // (its local corners 0/7 project to the same face diagonal). This makes
    // the tessellation face-compatible, hence the surface watertight.
    static const int tets[6][4] = {
        {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
        {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
    };
    static const int corner_off[8][3] = {
        {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
        {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
    };

    for (int x = 0; x < nx - 1; x++) {
      for (int y = 0; y < ny - 1; y++) {
        for (int z = 0; z < nz - 1; z++) {
          // fast reject: all 8 corners on one side
          bool any_lo = false, any_hi = false;
          for (int i = 0; i < 8; i++) {
            float v = at(x + corner_off[i][0], y + corner_off[i][1],
                         z + corner_off[i][2]);
            if (v < level) any_lo = true; else any_hi = true;
          }
          if (!(any_lo && any_hi)) continue;

          for (int t = 0; t < 6; t++) {
            int c[4][3];
            for (int i = 0; i < 4; i++) {
              int corner = tets[t][i];
              c[i][0] = x + corner_off[corner][0];
              c[i][1] = y + corner_off[corner][1];
              c[i][2] = z + corner_off[corner][2];
            }
            do_tet(c);
          }
        }
      }
    }
  }

  void normals(float* out) const {
    size_t nv = verts.size() / 3;
    for (size_t i = 0; i < nv; i++) {
      float px = verts[3 * i], py = verts[3 * i + 1], pz = verts[3 * i + 2];
      int x = static_cast<int>(px), y = static_cast<int>(py),
          z = static_cast<int>(pz);
      float gx = at_clamped(x + 1, y, z) - at_clamped(x - 1, y, z);
      float gy = at_clamped(x, y + 1, z) - at_clamped(x, y - 1, z);
      float gz = at_clamped(x, y, z + 1) - at_clamped(x, y, z - 1);
      float n = std::sqrt(gx * gx + gy * gy + gz * gz);
      if (n < 1e-12f) n = 1.f;
      out[3 * i] = gx / n;
      out[3 * i + 1] = gy / n;
      out[3 * i + 2] = gz / n;
    }
  }
};

}  // namespace

extern "C" {

void* mc_run(const float* vol, int nx, int ny, int nz, float level) {
  auto* mb = new MeshBuilder();
  mb->vol = vol;
  mb->nx = nx;
  mb->ny = ny;
  mb->nz = nz;
  mb->level = level;
  mb->run();
  return mb;
}

void mc_counts(void* handle, int64_t* nv, int64_t* nf) {
  auto* mb = static_cast<MeshBuilder*>(handle);
  *nv = static_cast<int64_t>(mb->verts.size() / 3);
  *nf = static_cast<int64_t>(mb->faces.size() / 3);
}

void mc_copy(void* handle, float* verts, int32_t* faces, float* norms) {
  auto* mb = static_cast<MeshBuilder*>(handle);
  std::memcpy(verts, mb->verts.data(), mb->verts.size() * sizeof(float));
  std::memcpy(faces, mb->faces.data(), mb->faces.size() * sizeof(int32_t));
  mb->normals(norms);
}

void mc_free(void* handle) { delete static_cast<MeshBuilder*>(handle); }

}  // extern "C"
