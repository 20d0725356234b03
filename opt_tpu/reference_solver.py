"""Independent reference solver — the Ceres-comparison analogue.

The reference's de-facto correctness oracle is cross-solver final-cost
agreement: every example can run the same problem through Opt(GN), Opt(LM)
and a CPU Ceres solver and compare final energies
(examples/shared/CombinedSolverBase.h:62-65, CeresSolverBase.h; SURVEY §4).
Here the independent solver is scipy.optimize.least_squares (TRF — the same
trust-region family as Ceres), fed the SAME energy definition through the
compiled residual function but optimized entirely by scipy's own algorithm
with an autodiff Jacobian. Agreement in final cost validates the solver
stack end-to-end; the energy definition itself is validated separately
against dense oracles (tests/test_operator_parity.py).

Limitations (oracle scope, mirroring the reference's Ceres usage): small
problems (dense Jacobian). Exclude-frozen unknowns are held fixed at their
initial values (the solver's semantics: excluded rows never update), so the
oracle optimizes exactly the same free variables as Opt.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def solve_scipy(
    spec_fn,
    dims: Dict[str, int],
    inputs: Dict[str, Any],
    max_nfev: int = 200,
    method: str = "trf",
):
    """Run the energy through scipy.optimize.least_squares.

    Returns (final_cost, unknowns dict). Cost convention matches the
    framework: ½ Σ r² over non-excluded residual centers.
    """
    import jax
    import jax.numpy as jnp
    from scipy.optimize import least_squares

    from .compile import compile_spec
    from .functions import FunctionSet

    compiled = compile_spec(spec_fn, dims, jnp.float32)
    unknowns, consts, graphs, params = compiled.normalize_inputs(inputs)
    fs = FunctionSet(compiled, consts, graphs, params)
    excl, row_masks = fs.masks(unknowns)

    names = list(compiled.unknown_names)
    shapes = {u: unknowns[u].shape for u in names}
    sizes = {u: int(np.prod(shapes[u])) for u in names}

    # Excluded unknowns are frozen at their initial values (the solver's
    # exclude gating never updates those rows, solverGPUGaussNewton.t:371);
    # scipy must optimize the same free-variable subspace or it would find a
    # different (lower) optimum by moving frozen pixels.
    free = np.concatenate(
        [
            (
                np.ones(sizes[u], bool)
                if row_masks.get(u) is None
                else np.broadcast_to(
                    np.asarray(row_masks[u]) != 0, shapes[u]
                ).reshape(-1)
            )
            for u in names
        ]
    )

    def unpack(x):
        out = {}
        o = 0
        for u in names:
            out[u] = jnp.asarray(
                x[o : o + sizes[u]], jnp.float32
            ).reshape(shapes[u])
            o += sizes[u]
        return out

    def resid_jnp(x):
        X = unpack(x)
        terms = fs.F(X)
        parts = []
        for term, val in zip(compiled.terms, terms):
            m = compiled.term_cost_mask(term, excl)
            if m is not None:
                # cost masks squares by (1 - m); scale residuals by sqrt
                val = val * jnp.sqrt(jnp.maximum(1.0 - m, 0.0))
            parts.append(val.reshape(-1))
        return jnp.concatenate(parts)

    resid = jax.jit(resid_jnp)

    # Sparse Jacobian via the framework's COO export (jacobian.dump_jacobian,
    # the reference's dumpJ/saveJToCRS machinery, solverGPUGaussNewton.t:
    # 252-304). A dense jacfwd J is O(n_res × n_unk) memory — already ~9 GB
    # at a 64² 4-channel grid — while the true J has a few nonzeros per row.
    # TRF accepts sparse J with tr_solver="lsmr". Row ordering matches
    # resid_jnp's concatenation exactly (term-major, then element×channel),
    # and rows are scaled by the same sqrt cost-mask factors.
    from scipy import sparse as _sp

    from .jacobian import dump_jacobian

    scale_parts = []
    for term, val in zip(compiled.terms, fs.F(unknowns)):
        m = compiled.term_cost_mask(term, excl)
        if m is None:
            scale_parts.append(np.ones(val.size, np.float64))
        else:
            s = np.sqrt(np.maximum(1.0 - np.asarray(m, np.float64), 0.0))
            scale_parts.append(
                np.broadcast_to(s, np.asarray(val).shape).reshape(-1)
            )
    row_scale = np.concatenate(scale_parts)

    def jac_sparse(xf):
        X = unpack(embed(xf))
        d = dump_jacobian(compiled, X, consts, graphs, params)
        J = _sp.coo_matrix(
            (
                np.asarray(d["vals"], np.float64) * row_scale[d["rows"]],
                (d["rows"], d["cols"]),
            ),
            shape=d["shape"],
        ).tocsr()
        return J[:, free]

    x0 = np.concatenate(
        [np.asarray(unknowns[u], np.float64).reshape(-1) for u in names]
    )

    def embed(xf):
        x = x0.copy()
        x[free] = xf
        return x

    res = least_squares(
        lambda xf: np.asarray(
            resid(jnp.asarray(embed(xf), jnp.float32)), np.float64
        ),
        x0[free],
        jac=jac_sparse,
        method=method,
        tr_solver="lsmr",
        max_nfev=max_nfev,
    )
    final_cost = 0.5 * float(np.sum(res.fun**2))
    x_full = embed(res.x)
    out = {}
    o = 0
    for u in names:
        out[u] = np.asarray(
            x_full[o : o + sizes[u]], np.float32
        ).reshape(shapes[u])
        o += sizes[u]
    return final_cost, out
