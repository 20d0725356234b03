"""Intrinsic image decomposition with a robust L_p albedo prior
(reference: examples/intrinsic_image_decomposition).

Splits an image into albedo r and shading s with an IRLS-style L_p
regularizer whose weights are recomputed from the current albedo each
nonlinear iteration (the reference's const-view-of-unknown trick).
"""

import numpy as np

from common import data_path, example_argparser, maybe_add_ceres, setup_backend

import opt_tpu as ot
from opt_tpu.harness import CombinedSolverBase
from opt_tpu.models.specs import intrinsic_image_decomposition
from opt_tpu.utils.io import load_image


class IntrinsicSolver(CombinedSolverBase):
    def __init__(self, img, params):
        h, w, _ = img.shape
        super().__init__(intrinsic_image_decomposition, {"W": h, "H": w}, params)
        self.img = img

    def combined_solve_init(self):
        h, w, _ = self.img.shape
        self.problem_inputs = {
            "r": self.img.copy(),
            "s": np.zeros((h, w), np.float32),
            "i": self.img,
            "w_fitSqrt": np.sqrt(500.0),
            "w_regSqrtAlbedo": np.sqrt(1000.0),
            "w_regSqrtShading": np.sqrt(10000.0),
            "pNorm": 0.8,
        }

    def pre_single_solve(self):
        self.problem_inputs["r"] = self.img.copy()
        self.problem_inputs["s"] = np.zeros(self.img.shape[:2], np.float32)


def main():
    ap = example_argparser(__doc__)
    args = ap.parse_args()
    setup_backend(args)
    p = data_path("cat512.png")
    img = (
        load_image(p)[..., :3]
        if p
        else np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    )
    if args.small:
        h, w = img.shape[:2]
        img = img[h // 2 - 32 : h // 2 + 32, w // 2 - 32 : w // 2 + 32]
    params = (
        {"numIter": 1, "nonLinearIter": 3, "linearIter": 10}
        if args.small
        else {"numIter": 1, "nonLinearIter": 7, "linearIter": 10}
    )
    solver = IntrinsicSolver(img.astype(np.float32), params)
    # GN only, like the reference. Converged-oracle mode adds LM for the
    # cross-solver comparison on this robust-norm (IRLS) energy
    # (docs/REGRESSION.md).
    solver.add_opt_solvers(
        ["gaussNewtonGPU"] + (["LMGPU"] if args.converged else [])
    )
    maybe_add_ceres(solver, args)
    solver.solve_all()
    solver.report_final_costs()
    solver.save_results_csv(args.results)


if __name__ == "__main__":
    main()
