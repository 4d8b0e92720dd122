#ifndef CPG_CORE_H
#define CPG_CORE_H
#include <stdint.h>
#ifdef __cplusplus
extern "C" {
#endif
void* cpg_native_init(int64_t n, int64_t m, int64_t p, int64_t n_eq);
void cpg_native_set_cones(void* h, int64_t n_nonneg, int64_t n_soc,
                          const int64_t* soc_dims);
void cpg_native_set_cones_ext(void* h, int64_t n_exp, int64_t n_pow,
                              const double* pow_alphas);
void cpg_native_set_map(void* h, int32_t which, int64_t n_rows,
                        const int64_t* indptr, const int64_t* indices,
                        const double* data);
/* sparse/banded mode (long-horizon families): P/A as COO with fixed
 * indices; the matching map then has nnz rows (no dense expansion) */
void cpg_native_set_scatter(void* h, int32_t which, int64_t nnz,
                            const int64_t* ii, const int64_t* jj);
void cpg_native_set_perm(void* h, const int64_t* perm, int64_t bw);
void cpg_native_set_dquad(void* h, const double* dq);
void cpg_native_set_theta(void* h, const double* theta);
void cpg_native_update_theta(void* h, int64_t idx, double val);
void cpg_native_set_setting(void* h, int32_t which, double val);
void cpg_native_solve(void* h);
double cpg_native_obj(void* h);
int32_t cpg_native_status(void* h);
int32_t cpg_native_iters(void* h);
double cpg_native_pri_res(void* h);
double cpg_native_dua_res(void* h);
void cpg_native_get_x(void* h, double* out);
void cpg_native_get_y(void* h, double* out);
/* VJP at the last solve: seeds dL/dx (len n, nullable), dL/dy (len m,
 * nullable, active rows), dL/dobj scalar -> dL/dtheta (len p).
 * Returns 0 ok, -1 conic family (unsupported), -2 no prior solve,
 * -3 singular reduced KKT. */
int32_t cpg_native_gradient(void* h, const double* gx, const double* gy,
                            double gobj, double* dtheta);
void cpg_native_free(void* h);
/* emitted by cpg_data.c for this family */
void* cpg_setup(void);
extern const int64_t cpg_n, cpg_m, cpg_p;
extern const double cpg_theta_default[];
#ifdef __cplusplus
}
#endif
#endif
