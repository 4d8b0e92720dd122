#ifndef CPG_FAMILY_H
#define CPG_FAMILY_H
#include "cpg_core.h"
#ifdef __cplusplus
extern "C" {
#endif
void cpg_update_A(void* h, int64_t idx, double val);
void cpg_update_b(void* h, int64_t idx, double val);
#define CPG_VAR_X_OFFSET 0
#define CPG_VAR_X_SIZE 2
#ifdef __cplusplus
}
#endif
#endif
