/* Family data (reference cpg_workspace.c role): theta-affine canonicalization maps in CSR. */
#include "cpg_core.h"
#include "cpg_family.h"
#include <stddef.h>
static const int64_t cpg_map_P_indptr[] = {
  0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
  0, 0, 0, 1, 1, 1, 1, 1, 1, 2,
  2, 2, 2, 2, 2, 3
};
static const int64_t cpg_map_P_indices[] = {
  6, 6, 6
};
static const double cpg_map_P_data[] = {
  2, 2, 2
};
static const int64_t cpg_map_P_rows = 25;
static const int64_t cpg_map_q_indptr[] = {
  0, 0, 0, 0, 0, 0
};
static const int64_t cpg_map_q_indices[] = {
  0
};
static const double cpg_map_q_data[] = {
  0
};
static const int64_t cpg_map_q_rows = 5;
static const int64_t cpg_map_d_indptr[] = {
  0, 0
};
static const int64_t cpg_map_d_indices[] = {
  0
};
static const double cpg_map_d_data[] = {
  0
};
static const int64_t cpg_map_d_rows = 1;
static const int64_t cpg_map_A_indptr[] = {
  0, 1, 2, 3, 3, 3, 3, 4, 4, 5,
  5, 5, 5, 5, 5, 6, 7, 7, 7, 7,
  7, 7, 8, 8, 8, 8
};
static const int64_t cpg_map_A_indices[] = {
  0, 1, 6, 2, 6, 6, 6, 6
};
static const double cpg_map_A_data[] = {
  -1, -1, 1, -1,
  1, 1, 1, 1
};
static const int64_t cpg_map_A_rows = 25;
static const int64_t cpg_map_b_indptr[] = {
  0, 1, 2, 3, 3, 3
};
static const int64_t cpg_map_b_indices[] = {
  3, 4, 5
};
static const double cpg_map_b_data[] = {
  1, 1, 1
};
static const int64_t cpg_map_b_rows = 5;
const int64_t cpg_n = 5, cpg_m = 5, cpg_p = 6;
const double cpg_theta_default[] = {
  1.6243453636632417, -0.61175641365007538, -0.5281717522634557, -1.0729686221561705,
  0.86540762932467852, -2.3015386968802827
};
void* cpg_setup(void) {
  void* h = cpg_native_init(5, 5, 6, 3);
  cpg_native_set_map(h, 0, cpg_map_P_rows, cpg_map_P_indptr, cpg_map_P_indices, cpg_map_P_data);
  cpg_native_set_map(h, 1, cpg_map_q_rows, cpg_map_q_indptr, cpg_map_q_indices, cpg_map_q_data);
  cpg_native_set_map(h, 2, cpg_map_d_rows, cpg_map_d_indptr, cpg_map_d_indices, cpg_map_d_data);
  cpg_native_set_map(h, 3, cpg_map_A_rows, cpg_map_A_indptr, cpg_map_A_indices, cpg_map_A_data);
  cpg_native_set_map(h, 4, cpg_map_b_rows, cpg_map_b_indptr, cpg_map_b_indices, cpg_map_b_data);
  cpg_native_set_theta(h, cpg_theta_default);
  return h;
}
void cpg_update_A(void* h, int64_t idx, double val) {
  cpg_native_update_theta(h, 0 + idx, val);
}
void cpg_update_b(void* h, int64_t idx, double val) {
  cpg_native_update_theta(h, 3 + idx, val);
}
