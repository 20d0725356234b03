"""Dense optical flow with a Gaussian-pyramid schedule
(reference: examples/optical_flow).

Flow between dogdance0/dogdance1 solved coarse-to-fine: the host loop swaps
pyramid levels and upsamples the flow between solves
(optical_flow/src/CombinedSolver.h:22-61); numIter=3 pyramid levels,
nonLinearIter=1, linearIter=50 (main.cpp:42-44).
"""

import numpy as np

from common import data_path, example_argparser, maybe_add_ceres, setup_backend

import opt_tpu as ot
from opt_tpu.harness import CombinedSolverBase
from opt_tpu.models.specs import optical_flow
from opt_tpu.utils.io import load_image


def gaussian_blur(img, sigma=1.0):
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(img, sigma=sigma)


def build_pyramid(img, levels):
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(gaussian_blur(pyr[-1])[::2, ::2])
    return pyr[::-1]  # coarse to fine


def derivative_images(img):
    """Central-difference derivative images, as the reference app computes
    on the host for SampledImage (optical_flow/src/CombinedSolver.h)."""
    dx = np.zeros_like(img)
    dy = np.zeros_like(img)
    dx[1:-1, :] = 0.5 * (img[2:, :] - img[:-2, :])
    dy[:, 1:-1] = 0.5 * (img[:, 2:] - img[:, :-2])
    return dx, dy


class FlowSolver(CombinedSolverBase):
    def __init__(self, im0, im1, params):
        self.levels = int(params.get("numIter", 3))
        self.pyr0 = build_pyramid(im0, self.levels)
        self.pyr1 = build_pyramid(im1, self.levels)
        h, w = self.pyr0[0].shape
        super().__init__(optical_flow, {"W": h, "H": w}, params)
        self.flow = np.zeros((h, w, 2), np.float32)

    def combined_solve_init(self):
        self._set_level(0)

    def _set_level(self, lvl):
        im0, im1 = self.pyr0[lvl], self.pyr1[lvl]
        dx, dy = derivative_images(im1)
        h, w = im0.shape
        self.dims = {"W": h, "H": w}
        self.problem_inputs = {
            "X": self.flow,
            "I": im0,
            "I_hat": im1,
            "I_hat_dx": dx,
            "I_hat_dy": dy,
            "w_fit": 10.0,
            "w_reg": 0.1,
        }

    def pre_nonlinear_solve(self, i):
        if i > 0:
            # upsample flow to the next (finer) level, scaling displacements
            f = np.asarray(self.problem_inputs["X"])
            f = np.repeat(np.repeat(f, 2, axis=0), 2, axis=1) * 2.0
            h, w = self.pyr0[i].shape
            self.flow = f[:h, :w]
            self._set_level(i)
            # plan must recompile for the new level size
            self.plan = ot.Problem(self.spec_fn).plan(
                dims=self.dims,
                kind=self.plan.kind,
                nIterations=int(self.solver_params["nonLinearIter"]),
                lIterations=int(self.solver_params["linearIter"]),
            )

    def _single_solve(self, kind):
        self.flow = np.zeros_like(self.flow[: self.pyr0[0].shape[0], : self.pyr0[0].shape[1]])
        self._set_level(0)
        return super()._single_solve(kind)


def main():
    ap = example_argparser(__doc__)
    args = ap.parse_args()
    setup_backend(args)
    p0, p1 = data_path("dogdance0.png"), data_path("dogdance1.png")
    if p0 and p1:
        im0 = load_image(p0).mean(-1).astype(np.float32)
        im1 = load_image(p1).mean(-1).astype(np.float32)
    else:
        rng = np.random.RandomState(0)
        im0 = rng.rand(64, 64).astype(np.float32)
        im1 = np.roll(im0, (1, 2), (0, 1))
    if args.small:
        im0, im1 = im0[:64, :64], im1[:64, :64]
    params = {"numIter": 3, "nonLinearIter": 1, "linearIter": 50}
    solver = FlowSolver(im0, im1, params)
    solver.add_opt_solvers(["gaussNewtonGPU"])
    solver.solve_all()
    solver.report_final_costs()
    solver.save_results_csv(args.results)


if __name__ == "__main__":
    main()
