// Native setup kernels for hypre_tpu.
//
// The AMG setup phase contains a few inherently sequential graph
// algorithms (greedy Ruge-Stüben coarsening with a priority structure)
// that cannot be vectorized in numpy and are three orders of magnitude
// too slow as Python loops.  This mirrors the reference, where the
// entire setup is native C (ref: src/parcsr_ls/par_coarsen.c:911
// hypre_BoomerAMGCoarsenRuge — the bucket-list first pass).
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in the
// image).  Build: see build.py next to this file.

#include <cstdint>
#include <vector>

extern "C" {

// Classical Ruge-Stüben first pass (the HMIS interior pass,
// ref: par_coarsen.c:911-1870).
//
//   S: strength pattern CSR (i depends on j for j in S[i])
//   ST: its transpose (j in ST[i] means j depends on i)
//   cf out: 1 = C, -1 = F, -3 = isolated (no strong connections)
//
// Greedy: repeatedly take an unassigned point with maximal measure
// (#unassigned dependents + boosts), make it C; its unassigned
// dependents become F; each new F point boosts the measure of the
// unassigned points IT depends on.  Bucket linked lists give O(nnz).
void rs_first_pass(int64_t n,
                   const int64_t* s_indptr, const int32_t* s_indices,
                   const int64_t* st_indptr, const int32_t* st_indices,
                   int32_t* cf) {
  std::vector<int64_t> measure(n);
  int64_t max_measure = 0;
  for (int64_t i = 0; i < n; ++i) {
    measure[i] = st_indptr[i + 1] - st_indptr[i];
    if (measure[i] > max_measure) max_measure = measure[i];
  }
  // isolated points: no strong row and no strong column
  for (int64_t i = 0; i < n; ++i) {
    if (measure[i] == 0 && s_indptr[i + 1] == s_indptr[i]) {
      cf[i] = -3;
    } else {
      cf[i] = 0;
    }
  }

  // bucket doubly-linked lists keyed by measure
  int64_t cap = max_measure + n + 2;  // measures can grow by boosts
  std::vector<int64_t> head(cap, -1), nxt(n, -1), prv(n, -1);
  std::vector<int64_t> where(n, -1);

  auto bucket_insert = [&](int64_t i, int64_t m) {
    nxt[i] = head[m];
    prv[i] = -1;
    if (head[m] >= 0) prv[head[m]] = i;
    head[m] = i;
    where[i] = m;
  };
  auto bucket_remove = [&](int64_t i) {
    int64_t m = where[i];
    if (prv[i] >= 0) nxt[prv[i]] = nxt[i]; else head[m] = nxt[i];
    if (nxt[i] >= 0) prv[nxt[i]] = prv[i];
    where[i] = -1;
  };

  for (int64_t i = 0; i < n; ++i)
    if (cf[i] == 0) bucket_insert(i, measure[i]);

  int64_t top = max_measure;
  while (true) {
    while (top > 0 && head[top] < 0) --top;
    if (top <= 0) break;
    int64_t i = head[top];
    bucket_remove(i);
    cf[i] = 1;  // C point
    // dependents of i become F
    for (int64_t p = st_indptr[i]; p < st_indptr[i + 1]; ++p) {
      int64_t j = st_indices[p];
      if (cf[j] != 0) continue;
      cf[j] = -1;  // F point
      bucket_remove(j);
      // boost the points j depends on
      for (int64_t q = s_indptr[j]; q < s_indptr[j + 1]; ++q) {
        int64_t k = s_indices[q];
        if (cf[k] != 0) continue;
        bucket_remove(k);
        measure[k] += 1;
        if (measure[k] >= cap) measure[k] = cap - 1;
        bucket_insert(k, measure[k]);
        if (measure[k] > top) top = measure[k];
      }
    }
    // i's own dependencies lose a dependent; hypre decrements their
    // measure (par_coarsen.c: "measure of j decreases")
    for (int64_t q = s_indptr[i]; q < s_indptr[i + 1]; ++q) {
      int64_t k = s_indices[q];
      if (cf[k] != 0) continue;
      bucket_remove(k);
      if (measure[k] > 0) measure[k] -= 1;
      bucket_insert(k, measure[k]);
    }
  }
  // leftovers (measure fell to 0): F points
  for (int64_t i = 0; i < n; ++i)
    if (cf[i] == 0) cf[i] = -1;
}

}  // extern "C"
