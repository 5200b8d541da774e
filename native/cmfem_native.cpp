// cmfem native runtime kernels: mesh IO + DOF topology + partitioning.
//
// The compute path of cmfem_tpu is jax/XLA/Pallas; this library provides the
// native runtime pieces that the reference implements in C++ on top of MFEM
// (Gmsh reading, finite-element DOF topology, mesh partitioning — SURVEY.md
// §1 L1 / §2.4).  Exposed as a C ABI consumed through ctypes; the Python
// layer falls back to its numpy implementations when the library is absent.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// GMSH v2.2 ASCII parser.
//
// Two-phase API: gmsh_open parses the file and returns a handle with counts;
// gmsh_read copies the arrays into caller-allocated buffers; gmsh_close
// frees.  Volume elements of one geometry + boundary elements of dim-1.
// ---------------------------------------------------------------------------

struct GmshFile {
  int dim = 0;
  int n_nodes = 0;
  int elem_nverts = 0;  // corners per volume element
  int bdr_nverts = 0;
  std::vector<double> xyz;       // n_nodes * 3
  std::vector<int32_t> elem;     // ne * elem_nverts
  std::vector<int32_t> elem_attr;
  std::vector<int32_t> bdr;      // nb * bdr_nverts
  std::vector<int32_t> bdr_attr;
};

static int gmsh_type_dim(int t, int *ncorner) {
  switch (t) {
    case 1: *ncorner = 2; return 1;   // line2
    case 8: *ncorner = 2; return 1;   // line3 (corners only)
    case 2: *ncorner = 3; return 2;   // tri3
    case 9: *ncorner = 3; return 2;   // tri6
    case 3: *ncorner = 4; return 2;   // quad4
    case 10: *ncorner = 4; return 2;  // quad9
    case 4: *ncorner = 4; return 3;   // tet4
    case 5: *ncorner = 8; return 3;   // hex8
    case 15: *ncorner = 1; return 0;  // point
  }
  return -1;
}

void *gmsh_open(const char *path, int *dim, int *n_nodes, int *n_elems,
                int *elem_nverts, int *n_bdr, int *bdr_nverts) {
  std::ifstream in(path);
  if (!in) return nullptr;
  auto gf = new GmshFile();

  std::vector<int64_t> node_ids;
  std::string line;
  struct RawElem {
    int type;
    int phys;
    std::vector<int64_t> nodes;
  };
  std::vector<RawElem> raw;

  while (std::getline(in, line)) {
    if (line.rfind("$MeshFormat", 0) == 0) {
      std::getline(in, line);
      if (line.rfind("2.", 0) != 0) {
        delete gf;
        return nullptr;
      }
      std::getline(in, line);  // $EndMeshFormat
    } else if (line.rfind("$Nodes", 0) == 0) {
      std::getline(in, line);
      long n = std::strtol(line.c_str(), nullptr, 10);
      node_ids.reserve(n);
      gf->xyz.reserve(3 * n);
      for (long i = 0; i < n; ++i) {
        std::getline(in, line);
        const char *s = line.c_str();
        char *end;
        node_ids.push_back(std::strtol(s, &end, 10));
        for (int d = 0; d < 3; ++d) {
          gf->xyz.push_back(std::strtod(end, &end));
        }
      }
      gf->n_nodes = (int)n;
    } else if (line.rfind("$Elements", 0) == 0) {
      std::getline(in, line);
      long n = std::strtol(line.c_str(), nullptr, 10);
      raw.reserve(n);
      for (long i = 0; i < n; ++i) {
        std::getline(in, line);
        std::istringstream iss(line);
        long id, type, ntags;
        iss >> id >> type >> ntags;
        long phys = 0, tag;
        for (long k = 0; k < ntags; ++k) {
          iss >> tag;
          if (k == 0) phys = tag;
        }
        RawElem re;
        re.type = (int)type;
        re.phys = (int)phys;
        long nd;
        while (iss >> nd) re.nodes.push_back(nd);
        raw.push_back(std::move(re));
      }
    }
  }

  // id -> index map
  std::unordered_map<int64_t, int32_t> id2idx;
  id2idx.reserve(node_ids.size() * 2);
  for (size_t i = 0; i < node_ids.size(); ++i) id2idx[node_ids[i]] = (int32_t)i;

  int max_dim = 0;
  for (auto &re : raw) {
    int nc;
    int d = gmsh_type_dim(re.type, &nc);
    if (d < 0) {
      // unknown element type: bail out so the Python reader rejects the
      // file with its clear error, instead of silently dropping volume
      // elements and returning a lower-dimensional mesh
      delete gf;
      return nullptr;
    }
    if (d > max_dim) max_dim = d;
  }
  gf->dim = max_dim;

  for (auto &re : raw) {
    int nc;
    int d = gmsh_type_dim(re.type, &nc);
    if (d != max_dim && d != max_dim - 1) continue;
    if ((long)re.nodes.size() < nc) {
      delete gf;
      return nullptr;  // truncated element line
    }
    int32_t conn[8];
    for (int k = 0; k < nc; ++k) {
      auto it = id2idx.find(re.nodes[k]);
      if (it == id2idx.end()) {
        delete gf;
        return nullptr;  // element references a node absent from $Nodes
      }
      conn[k] = it->second;
    }
    if (d == max_dim) {
      if (gf->elem_nverts == 0) gf->elem_nverts = nc;
      if (nc != gf->elem_nverts) {
        delete gf;
        return nullptr;  // mixed volume types unsupported
      }
      for (int k = 0; k < nc; ++k) gf->elem.push_back(conn[k]);
      gf->elem_attr.push_back(re.phys);
    } else {
      if (gf->bdr_nverts == 0) gf->bdr_nverts = nc;
      if (nc != gf->bdr_nverts) {
        delete gf;
        return nullptr;
      }
      for (int k = 0; k < nc; ++k) gf->bdr.push_back(conn[k]);
      gf->bdr_attr.push_back(re.phys);
    }
  }

  *dim = gf->dim;
  *n_nodes = gf->n_nodes;
  *n_elems = (int)gf->elem_attr.size();
  *elem_nverts = gf->elem_nverts;
  *n_bdr = (int)gf->bdr_attr.size();
  *bdr_nverts = gf->bdr_nverts ? gf->bdr_nverts : (gf->dim == 3 ? 4 : 2);
  return gf;
}

void gmsh_read(void *handle, double *xyz, int32_t *elem, int32_t *elem_attr,
               int32_t *bdr, int32_t *bdr_attr) {
  auto gf = (GmshFile *)handle;
  std::memcpy(xyz, gf->xyz.data(), gf->xyz.size() * sizeof(double));
  std::memcpy(elem, gf->elem.data(), gf->elem.size() * sizeof(int32_t));
  std::memcpy(elem_attr, gf->elem_attr.data(),
              gf->elem_attr.size() * sizeof(int32_t));
  if (!gf->bdr.empty()) {
    std::memcpy(bdr, gf->bdr.data(), gf->bdr.size() * sizeof(int32_t));
    std::memcpy(bdr_attr, gf->bdr_attr.data(),
                gf->bdr_attr.size() * sizeof(int32_t));
  }
}

void gmsh_close(void *handle) { delete (GmshFile *)handle; }

// ---------------------------------------------------------------------------
// Unique-edge enumeration for H1 DOF topology.
//
// conn: ne x nverts corner connectivity; edges: pairs of local vertex ids.
// Outputs per-element edge ids (ne x n_edges_per_elem) and directions (+-1),
// with canonical direction low->high global vertex id.  Returns the number
// of unique edges.
// ---------------------------------------------------------------------------

int64_t enumerate_edges(const int32_t *conn, int64_t ne, int nverts,
                        const int32_t *edge_pairs, int n_edges_per_elem,
                        int64_t *edge_ids, int32_t *edge_dirs) {
  std::unordered_map<uint64_t, int64_t> map;
  map.reserve((size_t)(ne * n_edges_per_elem / 3));
  int64_t next = 0;
  for (int64_t e = 0; e < ne; ++e) {
    const int32_t *row = conn + e * nverts;
    for (int le = 0; le < n_edges_per_elem; ++le) {
      int32_t a = row[edge_pairs[2 * le]];
      int32_t b = row[edge_pairs[2 * le + 1]];
      int32_t lo = a < b ? a : b, hi = a < b ? b : a;
      uint64_t key = ((uint64_t)(uint32_t)lo << 32) | (uint32_t)hi;
      auto it = map.find(key);
      int64_t id;
      if (it == map.end()) {
        id = next++;
        map.emplace(key, id);
      } else {
        id = it->second;
      }
      edge_ids[e * n_edges_per_elem + le] = id;
      edge_dirs[e * n_edges_per_elem + le] = (a <= b) ? 1 : -1;
    }
  }
  return next;
}

// ---------------------------------------------------------------------------
// Recursive coordinate bisection (RCB) partitioner.
//
// centroids: n x dim; parts must be a power-of-two-friendly count (any
// count works: splits proportionally).  Writes part ids [0, nparts).
// ---------------------------------------------------------------------------

static void rcb_recurse(const double *c, int dim, std::vector<int64_t> &idx,
                        int64_t lo, int64_t hi, int part_lo, int part_hi,
                        int32_t *parts) {
  if (part_hi - part_lo <= 1) {
    for (int64_t i = lo; i < hi; ++i) parts[idx[i]] = part_lo;
    return;
  }
  // split along the widest axis
  double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = lo; i < hi; ++i) {
    for (int d = 0; d < dim; ++d) {
      double v = c[idx[i] * dim + d];
      if (v < mn[d]) mn[d] = v;
      if (v > mx[d]) mx[d] = v;
    }
  }
  int axis = 0;
  for (int d = 1; d < dim; ++d)
    if (mx[d] - mn[d] > mx[axis] - mn[axis]) axis = d;

  int nparts = part_hi - part_lo;
  int left_parts = nparts / 2;
  int64_t mid = lo + (hi - lo) * (int64_t)left_parts / nparts;
  std::nth_element(idx.begin() + lo, idx.begin() + mid, idx.begin() + hi,
                   [&](int64_t a, int64_t b) {
                     return c[a * dim + axis] < c[b * dim + axis];
                   });
  rcb_recurse(c, dim, idx, lo, mid, part_lo, part_lo + left_parts, parts);
  rcb_recurse(c, dim, idx, mid, hi, part_lo + left_parts, part_hi, parts);
}

void rcb_partition(const double *centroids, int64_t n, int dim, int nparts,
                   int32_t *parts) {
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  rcb_recurse(centroids, dim, idx, 0, n, 0, nparts, parts);
}


// ---------------------------------------------------------------------------
// Uniform bucket-grid point locator (the ParMesh::FindPoints candidate
// stage).  Build once per mesh configuration (O(ne)); queries return
// bbox-filtered (point, element) candidate pairs for the Python layer's
// batched inverse-map Newton.  Replaces the dense O(npts * ne) bbox sweep
// that dominates the ALE remap's host time on moving meshes
// (ablation_test_case2_2_2D.cpp:3148-3273 analog).
// ---------------------------------------------------------------------------

struct Locator {
  int dim = 2;
  int64_t ne = 0;
  int nb[3] = {1, 1, 1};
  double lo[3] = {0, 0, 0};
  double inv_h[3] = {1, 1, 1};
  std::vector<double> elo, ehi;        // ne * dim element bboxes (padded)
  std::vector<int64_t> offsets;        // CSR bucket -> entries
  std::vector<int32_t> entries;
};

static inline int loc_clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

void *locator_build(const double *verts, int64_t nv, int dim,
                    const int32_t *conn, int64_t ne, int nc, double tol) {
  (void)nv;
  auto L = new Locator();
  L->dim = dim;
  L->ne = ne;
  L->elo.assign(ne * dim, 0.0);
  L->ehi.assign(ne * dim, 0.0);
  double glo[3] = {1e300, 1e300, 1e300}, ghi[3] = {-1e300, -1e300, -1e300};
  for (int64_t e = 0; e < ne; ++e) {
    for (int d = 0; d < dim; ++d) {
      double mn = 1e300, mx = -1e300;
      for (int k = 0; k < nc; ++k) {
        double v = verts[(int64_t)conn[e * nc + k] * dim + d];
        if (v < mn) mn = v;
        if (v > mx) mx = v;
      }
      L->elo[e * dim + d] = mn - tol;
      L->ehi[e * dim + d] = mx + tol;
      if (mn < glo[d]) glo[d] = mn;
      if (mx > ghi[d]) ghi[d] = mx;
    }
  }
  // ~4 elements per bucket on average, with per-axis counts sized to the
  // domain extent: an isotropic count on a high-aspect strip (one element
  // tall) would make every element straddle every bucket along the thin
  // axis — O(ne * nb) insertion instead of O(ne)
  double span[3] = {1.0, 1.0, 1.0};
  double vol = 1.0;
  for (int d = 0; d < dim; ++d) {
    span[d] = std::max((ghi[d] + tol) - (glo[d] - tol), 1e-300);
    vol *= span[d];
  }
  double h = std::pow(vol / std::max((double)ne / 4.0, 1.0), 1.0 / dim);
  int64_t nbuckets = 1;
  for (int d = 0; d < dim; ++d) {
    L->nb[d] = std::max(1, (int)(span[d] / h));
    L->lo[d] = glo[d] - tol;
    double sp = (ghi[d] + tol) - L->lo[d];
    L->inv_h[d] = sp > 0 ? L->nb[d] / sp : 1.0;
    nbuckets *= L->nb[d];
  }
  // count pass
  std::vector<int64_t> counts(nbuckets + 1, 0);
  auto bucket_range = [&](int64_t e, int b0[3], int b1[3]) {
    for (int d = 0; d < dim; ++d) {
      b0[d] = loc_clampi(
          (int)((L->elo[e * dim + d] - L->lo[d]) * L->inv_h[d]), 0,
          L->nb[d] - 1);
      b1[d] = loc_clampi(
          (int)((L->ehi[e * dim + d] - L->lo[d]) * L->inv_h[d]), 0,
          L->nb[d] - 1);
    }
    for (int d = dim; d < 3; ++d) { b0[d] = 0; b1[d] = 0; }
  };
  auto flat = [&](int ix, int iy, int iz) {
    return ((int64_t)iz * L->nb[1] + iy) * L->nb[0] + ix;
  };
  for (int64_t e = 0; e < ne; ++e) {
    int b0[3], b1[3];
    bucket_range(e, b0, b1);
    for (int iz = b0[2]; iz <= b1[2]; ++iz)
      for (int iy = b0[1]; iy <= b1[1]; ++iy)
        for (int ix = b0[0]; ix <= b1[0]; ++ix) counts[flat(ix, iy, iz) + 1]++;
  }
  L->offsets.assign(nbuckets + 1, 0);
  for (int64_t b = 0; b < nbuckets; ++b)
    L->offsets[b + 1] = L->offsets[b] + counts[b + 1];
  L->entries.assign(L->offsets[nbuckets], 0);
  std::vector<int64_t> cursor(L->offsets.begin(), L->offsets.end() - 1);
  for (int64_t e = 0; e < ne; ++e) {
    int b0[3], b1[3];
    bucket_range(e, b0, b1);
    for (int iz = b0[2]; iz <= b1[2]; ++iz)
      for (int iy = b0[1]; iy <= b1[1]; ++iy)
        for (int ix = b0[0]; ix <= b1[0]; ++ix)
          L->entries[cursor[flat(ix, iy, iz)]++] = (int32_t)e;
  }
  return L;
}

int64_t locator_query(void *handle, const double *pts, int64_t npts,
                      int64_t max_pairs, int64_t *pair_pts,
                      int64_t *pair_elems) {
  auto L = (Locator *)handle;
  int dim = L->dim;
  int64_t count = 0;
  for (int64_t p = 0; p < npts; ++p) {
    int ib[3] = {0, 0, 0};
    bool in_grid = true;
    for (int d = 0; d < dim; ++d) {
      double v = pts[p * dim + d];
      // inclusive padded-bbox test, then clamp the bucket index into the
      // grid: a point sitting exactly at bbox_max+tol computes ib == nb
      // but must still yield candidates (matching the numpy sweep's
      // inclusive `pts <= hi` comparison).
      double hi = L->lo[d] + (double)L->nb[d] / L->inv_h[d];
      if (v < L->lo[d] || v > hi) { in_grid = false; break; }
      ib[d] = loc_clampi((int)((v - L->lo[d]) * L->inv_h[d]), 0,
                         L->nb[d] - 1);
    }
    if (!in_grid) continue;
    int64_t b = ((int64_t)ib[2] * L->nb[1] + ib[1]) * L->nb[0] + ib[0];
    for (int64_t k = L->offsets[b]; k < L->offsets[b + 1]; ++k) {
      int32_t e = L->entries[k];
      bool inside = true;
      for (int d = 0; d < dim; ++d) {
        double v = pts[p * dim + d];
        if (v < L->elo[(int64_t)e * dim + d] ||
            v > L->ehi[(int64_t)e * dim + d]) { inside = false; break; }
      }
      if (!inside) continue;
      if (count < max_pairs) {
        pair_pts[count] = p;
        pair_elems[count] = e;
      }
      ++count;
    }
  }
  return count;
}

void locator_free(void *handle) { delete (Locator *)handle; }

}  // extern "C"
