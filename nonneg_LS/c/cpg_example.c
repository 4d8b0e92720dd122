/* Standalone example for this generated family (reference
 * cpg_example.c.jinja2:16-88 role): update the first parameter entry
 * through its named update function, solve, print solution head +
 * stats.  Build: `make`. */
#include <stdio.h>
#include <stdlib.h>
#include "cpg_core.h"
#include "cpg_family.h"

int main(void) {
  void* h = cpg_setup();
  /* named per-parameter update (reference cpg_update_<param>,
   * utils.py:909-926) */
  cpg_native_set_theta(h, cpg_theta_default);
  cpg_update_A(h, 0, cpg_theta_default[0]);
  cpg_native_solve(h);
  double* x = (double*)malloc(sizeof(double) * (size_t)cpg_n);
  cpg_native_get_x(h, x);
  printf("status = %d, iters = %d, obj = %.9g\n",
         cpg_native_status(h), cpg_native_iters(h), cpg_native_obj(h));
  printf("pri_res = %.3e, dua_res = %.3e\n",
         cpg_native_pri_res(h), cpg_native_dua_res(h));
  for (int64_t i = 0; i < (cpg_n < 8 ? cpg_n : 8); ++i)
    printf("x[%ld] = %.9g\n", (long)i, x[i]);
  { /* objective gradient w.r.t. theta (cpg_native_gradient) */
    double* dth = (double*)malloc(sizeof(double) * (size_t)(cpg_p > 0 ? cpg_p : 1));
    if (cpg_native_gradient(h, NULL, NULL, 1.0, dth) == 0)
      for (int64_t i = 0; i < (cpg_p < 4 ? cpg_p : 4); ++i)
        printf("dobj/dtheta[%ld] = %.9g\n", (long)i, dth[i]);
    free(dth);
  }
  free(x);
  cpg_native_free(h);
  return 0;
}
