// Native P1 FEM assembly: stiffness (Laplacian) + lumped mass, tri & tet.
//
// TPU-framework equivalent of pymathprim.geometry's C++ assembly routines
// used by the reference's data generators (datagen/heat.py:9 `laplacian`,
// `lumped_mass`; poisson.py:4; heat_tetmesh.py:11). Emits per-element COO
// triplets; Python sums duplicates into CSR via scipy.
//
// Elements: tets ([m,4] indices, vertices [n,3]) or triangles embedded in
// 3-D ([m,3]) — the triangle path reproduces the cotan-Laplacian that P1
// elements give on surface meshes.

#include <cmath>
#include <cstdint>

namespace {

inline void cross3(const double* a, const double* b, double* out) {
  out[0] = a[1] * b[2] - a[2] * b[1];
  out[1] = a[2] * b[0] - a[0] * b[2];
  out[2] = a[0] * b[1] - a[1] * b[0];
}

inline double dot3(const double* a, const double* b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}

}  // namespace

extern "C" {

// Tetrahedral P1 stiffness. verts [n,3], elems [m,4], field [m] (or null).
// Emits 16 triplets per element into rows/cols/vals (size 16*m).
// Also accumulates lumped mass (vol/4 per vertex) into mass[n] if non-null.
void assemble_p1_tet(int64_t n_verts, int64_t n_elems, const double* verts,
                     const int32_t* elems, const double* field,
                     int32_t* rows, int32_t* cols, double* vals,
                     double* mass) {
  for (int64_t e = 0; e < n_elems; ++e) {
    const int32_t* el = elems + 4 * e;
    const double* p0 = verts + 3 * el[0];
    const double* p1 = verts + 3 * el[1];
    const double* p2 = verts + 3 * el[2];
    const double* p3 = verts + 3 * el[3];
    double d1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    double d2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    double d3[3] = {p3[0] - p0[0], p3[1] - p0[1], p3[2] - p0[2]};
    double c23[3];
    cross3(d2, d3, c23);
    double det = dot3(d1, c23);  // 6*signed volume
    const double vol = std::fabs(det) / 6.0;
    if (det == 0.0) det = 1e-300;
    // gradients of barycentric coords: grad(l1..l3) rows of inv(J)^T,
    // grad(l0) = -(sum)
    double c31[3], c12[3];
    cross3(d3, d1, c31);
    cross3(d1, d2, c12);
    double g[4][3];
    for (int k = 0; k < 3; ++k) {
      g[1][k] = c23[k] / det;
      g[2][k] = c31[k] / det;
      g[3][k] = c12[k] / det;
      g[0][k] = -(g[1][k] + g[2][k] + g[3][k]);
    }
    const double coeff = (field ? field[e] : 1.0) * vol;
    int64_t base = 16 * e;
    for (int a = 0; a < 4; ++a) {
      for (int b = 0; b < 4; ++b) {
        rows[base] = el[a];
        cols[base] = el[b];
        vals[base] = coeff * dot3(g[a], g[b]);
        ++base;
      }
    }
    if (mass) {
      const double mq = vol / 4.0;
      for (int a = 0; a < 4; ++a) mass[el[a]] += mq;
    }
  }
}

// Triangle P1 stiffness (surface mesh in 3-D; cotan Laplacian).
// verts [n,3], elems [m,3], field [m] or null; 9 triplets per element.
// Lumped mass: area/3 per vertex.
void assemble_p1_tri(int64_t n_verts, int64_t n_elems, const double* verts,
                     const int32_t* elems, const double* field,
                     int32_t* rows, int32_t* cols, double* vals,
                     double* mass) {
  for (int64_t e = 0; e < n_elems; ++e) {
    const int32_t* el = elems + 3 * e;
    const double* p0 = verts + 3 * el[0];
    const double* p1 = verts + 3 * el[1];
    const double* p2 = verts + 3 * el[2];
    double d1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    double d2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
    double nrm[3];
    cross3(d1, d2, nrm);
    double two_area = std::sqrt(dot3(nrm, nrm));
    const double area = 0.5 * two_area;
    if (two_area == 0.0) two_area = 1e-300;
    // P1 gradients in the triangle plane: g_a = (n x opposite_edge)/(2A)
    // edges opposite to each vertex
    double e0[3] = {p2[0] - p1[0], p2[1] - p1[1], p2[2] - p1[2]};
    double e1[3] = {p0[0] - p2[0], p0[1] - p2[1], p0[2] - p2[2]};
    double e2[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
    double nh[3] = {nrm[0] / two_area, nrm[1] / two_area, nrm[2] / two_area};
    double g[3][3];
    cross3(nh, e0, g[0]);
    cross3(nh, e1, g[1]);
    cross3(nh, e2, g[2]);
    for (int a = 0; a < 3; ++a)
      for (int k = 0; k < 3; ++k) g[a][k] /= two_area;
    const double coeff = (field ? field[e] : 1.0) * area;
    int64_t base = 9 * e;
    for (int a = 0; a < 3; ++a) {
      for (int b = 0; b < 3; ++b) {
        rows[base] = el[a];
        cols[base] = el[b];
        vals[base] = coeff * dot3(g[a], g[b]);
        ++base;
      }
    }
    if (mass) {
      const double mq = area / 3.0;
      for (int a = 0; a < 3; ++a) mass[el[a]] += mq;
    }
  }
}

}  // extern "C"
