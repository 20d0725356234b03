/* Minimal C client for libopttpu — the analogue of tests/minimal
 * (reference: tests/minimal/main.cpp:10-62): 64x64 laplacian smoothing of
 * random noise through the C API, verifying the cost decreases and the
 * unknown buffer is written back. */

#include <stdio.h>
#include <stdlib.h>

#include "OptTpu.h"

int main(void) {
    const uint32_t W = 64, H = 64;
    Opt_InitializationParameters ip = {0, 1, 0, 0};
    Opt_State* state = Opt_NewState(ip);
    if (!state) { fprintf(stderr, "NewState failed: %s\n", Opt_LastError()); return 1; }

    Opt_Problem* prob =
        Opt_ProblemDefine(state, "native/test/laplacian_spec.py", "gaussNewtonGPU");
    if (!prob) { fprintf(stderr, "ProblemDefine failed: %s\n", Opt_LastError()); return 1; }

    uint32_t dims[2] = {W, H};
    Opt_Plan* plan = Opt_ProblemPlan(state, prob, dims, 2);
    if (!plan) { fprintf(stderr, "ProblemPlan failed: %s\n", Opt_LastError()); return 1; }

    Opt_SetSolverParameter(state, plan, "nIterations", 3);
    Opt_SetSolverParameter(state, plan, "lIterations", 30);

    float* x = (float*)malloc(sizeof(float) * W * H);
    float* a = (float*)malloc(sizeof(float) * W * H);
    srand(42);
    for (uint32_t i = 0; i < W * H; ++i) {
        a[i] = (float)rand() / (float)RAND_MAX;
        x[i] = a[i];
    }
    float x0_first = x[0];

    void* data[2] = {x, a};
    Opt_ProblemInit(state, plan, data, 2);
    double init_cost = Opt_ProblemCurrentCost(state, plan);
    while (Opt_ProblemStep(state, plan)) {
        printf("cost: %f\n", Opt_ProblemCurrentCost(state, plan));
    }
    double final_cost = Opt_ProblemCurrentCost(state, plan);
    printf("init=%f final=%f\n", init_cost, final_cost);

    if (!(final_cost < init_cost)) {
        fprintf(stderr, "FAIL: cost did not decrease\n");
        return 2;
    }
    if (x[0] == x0_first) {
        fprintf(stderr, "FAIL: unknown buffer not written back\n");
        return 3;
    }

    /* lifecycle cycling (reference tests/create_delete_cycle/main.cpp:22-27) */
    for (int i = 0; i < 10; ++i) {
        Opt_Plan* p2 = Opt_ProblemPlan(state, prob, dims, 2);
        if (!p2) { fprintf(stderr, "plan cycle failed\n"); return 4; }
        Opt_PlanFree(state, p2);
    }

    Opt_PlanFree(state, plan);
    Opt_ProblemDelete(state, prob);
    Opt_FreeState(state);
    free(x);
    free(a);
    printf("PASS\n");
    return 0;
}
