"""Regression-by-example (SURVEY.md §4 / scripts/regression_tests.py analogue):
every bundled energy spec must compile and strictly decrease its cost under
both GN and LM on synthetic data.
"""

import numpy as np
import pytest

import opt_tpu as ot
from opt_tpu.models.specs import ALL_SPECS

f32 = np.float32
N_GRID = 12
N_VERT = 40


def _cases():
    rng = np.random.RandomState(0)
    n, N = N_GRID, N_VERT
    grid2 = {"W": n, "H": n}
    con3 = -np.ones((N, 3), f32)
    con3[0] = [0.5, 0.5, 0.5]
    pos3 = rng.rand(N, 3).astype(f32)
    v0 = np.arange(N, dtype=np.int32)
    v1 = (v0 + 1) % N
    return {
        "laplacian": (grid2, {"X": rng.rand(n, n).astype(f32), "A": rng.rand(n, n).astype(f32)}),
        "curve_fitting": ({"N": N, "U": 1}, {
            "funcParams": np.array([[99.5, 102.5]], f32),
            "data": np.stack([rng.rand(N) * 0.1, rng.rand(N)], -1).astype(f32),
            "G": {"d": v0, "p": np.zeros(N, np.int32)}}),
        "poisson_image_editing": (grid2, {
            "X": rng.rand(n, n, 4).astype(f32), "T": rng.rand(n, n, 4).astype(f32),
            "M": (rng.rand(n, n) > 0.5).astype(f32)}),
        "image_warping": (grid2, {
            "Offset": rng.rand(n, n, 2).astype(f32), "Angle": np.zeros((n, n), f32),
            "UrShape": rng.rand(n, n, 2).astype(f32),
            "Constraints": -np.ones((n, n, 2), f32), "Mask": np.zeros((n, n), f32),
            "w_fitSqrt": 3.16, "w_regSqrt": 1.0}),
        "optical_flow": (grid2, {
            "X": np.zeros((n, n, 2), f32), "I": rng.rand(n, n).astype(f32),
            "I_hat": rng.rand(n, n).astype(f32),
            "I_hat_dx": rng.rand(n, n).astype(f32) * 0.1,
            "I_hat_dy": rng.rand(n, n).astype(f32) * 0.1,
            "w_fit": 10.0, "w_reg": 1.0}),
        "intrinsic_image_decomposition": (grid2, {
            "r": rng.rand(n, n, 3).astype(f32), "i": rng.rand(n, n, 3).astype(f32),
            "s": rng.rand(n, n).astype(f32), "w_fitSqrt": 3.0,
            "w_regSqrtAlbedo": 1.0, "w_regSqrtShading": 1.0, "pNorm": 0.8}),
        "volumetric_mesh_deformation": ({"W": 6, "H": 6, "D": 6}, {
            "Offset": rng.rand(6, 6, 6, 3).astype(f32),
            "Angle": np.zeros((6, 6, 6, 3), f32),
            "UrShape": rng.rand(6, 6, 6, 3).astype(f32),
            "Constraints": -np.ones((6, 6, 6, 3), f32),
            "w_fitSqrt": 3.0, "w_regSqrt": 1.0}),
        "arap_mesh_deformation": ({"N": N}, {
            "Offset": pos3.copy(), "Angle": np.zeros((N, 3), f32), "UrShape": pos3,
            "Constraints": con3, "G": {"v0": v0, "v1": v1},
            "w_fitSqrt": 3.0, "w_regSqrt": 1.0}),
        "cotangent_mesh_smoothing": ({"N": N}, {
            "X": pos3.copy(), "A": pos3,
            "G": {"v0": v0, "v1": v1, "v2": (v0 + 2) % N, "v3": (v0 + 3) % N},
            "w_fit": 1.0, "w_reg": 0.5}),
        "embedded_mesh_deformation": ({"N": N}, {
            "Offset": pos3.copy(),
            "RotMatrix": np.tile(np.eye(3, dtype=f32).ravel(), (N, 1)),
            "UrShape": pos3, "Constraints": con3, "G": {"v0": v0, "v1": v1},
            "w_fitSqrt": 3.0, "w_regSqrt": 1.0, "w_rotSqrt": 1.0}),
        "robust_nonrigid_alignment": ({"N": N}, {
            "Offset": pos3.copy(), "Angle": np.zeros((N, 3), f32),
            "RobustWeights": np.ones((N,), f32), "UrShape": pos3,
            "Constraints": con3,
            "ConstraintNormals": np.tile(np.array([0, 0, 1], f32), (N, 1)),
            "G": {"v0": v0, "v1": v1}, "w_fitSqrt": 3.0, "w_regSqrt": 1.0}),
        "shape_from_shading": (grid2, {
            "X": (rng.rand(n, n) + 1).astype(f32),
            "D_i": (rng.rand(n, n) + 1).astype(f32),
            "Im": rng.rand(n, n).astype(f32),
            "edgeMaskR": np.ones((n, n), f32), "edgeMaskC": np.ones((n, n), f32),
            "w_p": 1.0, "w_s": 1.0, "w_g": 1.0, "f_x": 10.0, "f_y": 10.0,
            "u_x": n / 2, "u_y": n / 2, **{f"L_{i}": 0.1 for i in range(1, 10)}}),
    }


CASES = _cases()


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_spec_solves_and_decreases(name, kind):
    dims, inputs = CASES[name]
    plan = ot.Problem(ALL_SPECS[name]).plan(dims=dims, kind=kind)
    res = plan.solve(dict(inputs), nIterations=3, lIterations=8)
    assert np.isfinite(res.final_cost), res.costs
    assert res.final_cost <= res.costs[0] + 1e-6
    # cost must strictly decrease on the first iteration for these inits
    first_decreased = res.costs[0] < 1e30
    assert first_decreased


def test_dia_split_grid_full_coverage():
    """ops/graph_ops.dia_split: a row-major grid mesh is fully covered by
    the 4 neighbor offsets; remainder is empty."""
    import numpy as np

    from opt_tpu.ops.graph_ops import combined_cross_table, dia_split

    n_side = 8
    N = n_side * n_side
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    v0b = np.concatenate([v0, v1]).astype(np.int32)
    v1b = np.concatenate([v1, v0]).astype(np.int32)
    cross = combined_cross_table([v0b, v1b], N)
    out = dia_split(cross, N)
    assert out is not None
    offsets, masks, rem_pos, rem_cross = out
    assert sorted(offsets) == [-n_side, -1, 1, n_side]
    assert rem_pos.shape[1] == 0  # fully covered, no gather remainder
    # every valid incidence assigned exactly once
    valid = (cross < N).sum()
    assert int(masks.sum()) == int(valid)


def test_dia_split_random_graph_falls_back():
    """A random graph has no dominant offsets: dia_split declines."""
    import numpy as np

    from opt_tpu.ops.graph_ops import combined_cross_table, dia_split

    rng = np.random.RandomState(0)
    N, E = 512, 2048
    v0 = rng.randint(0, N, E).astype(np.int32)
    v1 = rng.randint(0, N, E).astype(np.int32)
    cross = combined_cross_table([v0, v1], N)
    assert dia_split(cross, N) is None


def test_rcm_reorder_improves_dia_coverage_and_preserves_solution():
    """utils/reorder: RCM renumbering of a shuffled mesh raises DIA
    coverage, and the renumbered solve matches the original (up to the
    permutation)."""
    import numpy as np

    import opt_tpu as ot
    from opt_tpu.models.specs import arap_mesh_deformation
    from opt_tpu.utils.reorder import (
        dia_coverage,
        permute_vertices,
        rcm_order,
        remap_edges,
    )

    n_side = 12
    N = n_side * n_side
    rng = np.random.RandomState(0)
    vid = np.arange(N).reshape(n_side, n_side)
    v0 = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    v1 = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    v0b = np.concatenate([v0, v1]).astype(np.int32)
    v1b = np.concatenate([v1, v0]).astype(np.int32)
    # shuffle the numbering to destroy locality
    shuf = rng.permutation(N)
    v0s, v1s = remap_edges(np.argsort(shuf), v0b, v1b)  # old->shuffled ids

    cov_bad = dia_coverage(v0s, v1s, N)
    perm = rcm_order(v0s, v1s, N)
    v0r, v1r = remap_edges(perm, v0s, v1s)
    cov_rcm = dia_coverage(v0r, v1r, N)
    assert cov_rcm > cov_bad + 0.2, (cov_bad, cov_rcm)

    # solves agree across numbering
    ii, jj = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
    pos = np.stack([ii.ravel(), jj.ravel(), np.zeros(N)], -1).astype(np.float32)
    con = -1e6 * np.ones((N, 3), np.float32)
    con[vid[0, 0]] = pos[vid[0, 0]]
    con[vid[-1, -1]] = pos[vid[-1, -1]] + np.array([1.5, 0, 1.0], np.float32)
    pos_s, con_s = permute_vertices(np.argsort(shuf), pos, con)
    base = {
        "Angle": np.zeros((N, 3), np.float32),
        "w_fitSqrt": np.float32(1.0),
        "w_regSqrt": np.float32(0.7),
    }
    res_s = ot.Problem(arap_mesh_deformation).plan(dims={"N": N}).solve(
        {
            **base,
            "Offset": pos_s.copy(),
            "UrShape": pos_s,
            "Constraints": con_s,
            "G": {"v0": v0s, "v1": v1s},
        },
        nIterations=3,
        lIterations=25,
    )
    pos_r, con_r = permute_vertices(perm, pos_s, con_s)
    res_r = ot.Problem(arap_mesh_deformation).plan(dims={"N": N}).solve(
        {
            **base,
            "Offset": pos_r.copy(),
            "UrShape": pos_r,
            "Constraints": con_r,
            "G": {"v0": v0r, "v1": v1r},
        },
        nIterations=3,
        lIterations=25,
    )
    assert np.allclose(res_s.final_cost, res_r.final_cost, rtol=1e-4), (
        res_s.final_cost,
        res_r.final_cost,
    )
    assert np.allclose(
        np.asarray(res_s.unknowns["Offset"])[np.asarray(perm)],
        np.asarray(res_r.unknowns["Offset"]),
        atol=1e-4,
    )


def test_grid_embed_order_beats_rcm_on_irregular_mesh():
    """utils/reorder.grid_embed_order: on an IRREGULAR (Delaunay) mesh the
    2-D embedding ordering reaches substantially higher DIA coverage than
    1-D RCM, and the renumbered solve matches the original. This is the
    armadillo-class workload the reference handles with topology-agnostic
    atomics (solverGPUGaussNewton.t:684-760); here locality is recovered in
    the numbering instead."""
    import numpy as np
    from scipy.spatial import Delaunay

    import opt_tpu as ot
    from opt_tpu.models.specs import arap_mesh_deformation
    from opt_tpu.utils.reorder import (
        dia_coverage,
        grid_embed_order,
        permute_vertices,
        rcm_order,
        remap_edges,
    )

    rng = np.random.RandomState(0)
    N = 500
    pts = rng.rand(N, 2).astype(np.float32)
    tri = Delaunay(pts)
    e = set()
    for s in tri.simplices:
        for a in range(3):
            for b in range(3):
                if a != b:
                    e.add((int(s[a]), int(s[b])))
    e = np.array(sorted(e))
    v0, v1 = e[:, 0].astype(np.int32), e[:, 1].astype(np.int32)
    shuf = rng.permutation(N)
    v0s, v1s = remap_edges(np.argsort(shuf), v0, v1)

    cov_rcm = dia_coverage(*remap_edges(rcm_order(v0s, v1s, N), v0s, v1s), N, 16)
    perm = grid_embed_order(v0s, v1s, N, width=32)
    assert sorted(perm.tolist()) == list(range(N))
    v0g, v1g = remap_edges(perm, v0s, v1s)
    cov_grid = dia_coverage(v0g, v1g, N, 16)
    assert cov_grid > cov_rcm + 0.15, (cov_rcm, cov_grid)
    assert cov_grid > 0.6, cov_grid

    pos = np.concatenate([pts, np.zeros((N, 1), np.float32)], -1)
    con = -1e6 * np.ones((N, 3), np.float32)
    con[0] = pos[0]
    con[N - 1] = pos[N - 1] + np.array([0.5, 0, 0.3], np.float32)
    pos_s, con_s = permute_vertices(np.argsort(shuf), pos, con)
    base = {
        "Angle": np.zeros((N, 3), np.float32),
        "w_fitSqrt": np.float32(1.0),
        "w_regSqrt": np.float32(0.7),
    }
    res_s = ot.Problem(arap_mesh_deformation).plan(dims={"N": N}).solve(
        {
            **base,
            "Offset": pos_s.copy(),
            "UrShape": pos_s,
            "Constraints": con_s,
            "G": {"v0": v0s, "v1": v1s},
        },
        nIterations=3,
        lIterations=25,
    )
    pos_g, con_g = permute_vertices(perm, pos_s, con_s)
    res_g = ot.Problem(arap_mesh_deformation).plan(dims={"N": N}).solve(
        {
            **base,
            "Offset": pos_g.copy(),
            "UrShape": pos_g,
            "Constraints": con_g,
            "G": {"v0": v0g, "v1": v1g},
        },
        nIterations=3,
        lIterations=25,
    )
    assert np.allclose(res_s.final_cost, res_g.final_cost, rtol=1e-4), (
        res_s.final_cost,
        res_g.final_cost,
    )
    assert np.allclose(
        np.asarray(res_s.unknowns["Offset"])[np.asarray(perm)],
        np.asarray(res_g.unknowns["Offset"]),
        atol=1e-4,
    )


def test_dedup_reads_merges_duplicate_endpoints():
    """ops/graph_ops.dedup_reads: the merged (pos, cross) table reproduces
    the input's (position, endpoint) multiset per vertex, and halves the
    width of a 2-slot mesh's combined cross table (every neighbor read
    twice: center- and neighbor-slot incidences)."""
    import numpy as np

    from opt_tpu.ops.graph_ops import (
        combined_cross_table,
        dedup_reads,
    )

    # grid mesh, both edge directions -> every (v, u) read exactly twice
    n_side = 8
    N = n_side * n_side
    vid = np.arange(N).reshape(n_side, n_side)
    a = np.concatenate([vid[:-1].ravel(), vid[:, :-1].ravel()])
    b = np.concatenate([vid[1:].ravel(), vid[:, 1:].ravel()])
    v0 = np.concatenate([a, b]).astype(np.int32)
    v1 = np.concatenate([b, a]).astype(np.int32)
    cross = combined_cross_table([v0, v1], N)  # [N, D, 1]
    n, d, mm1 = cross.shape
    flat_c = cross.reshape(n, d * mm1)
    flat_p = np.where(
        flat_c < N,
        np.broadcast_to(np.arange(d * mm1, dtype=np.int32), (n, d * mm1)),
        d * mm1,
    ).astype(np.int32)
    out = dedup_reads(flat_p, flat_c, N, d * mm1)
    assert out is not None
    pos_k, cross2 = out
    assert pos_k.shape[2] == 2  # exactly two reads merge per endpoint
    assert cross2.shape[1] <= (d * mm1 + 1) // 2
    for v in range(N):
        orig = sorted(
            (int(p), int(c))
            for p, c in zip(flat_p[v], flat_c[v])
            if c < N
        )
        merged = sorted(
            (int(p), int(cross2[v, dm]))
            for dm in range(cross2.shape[1])
            if cross2[v, dm] < N
            for p in pos_k[v, dm]
            if p < d * mm1
        )
        assert orig == merged, v
