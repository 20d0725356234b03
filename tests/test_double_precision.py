"""Double-precision solves (the reference's OPT_DOUBLE_PRECISION path:
precision.t + tests/minimal_graph_only runs its curve fit in double).
Run in a subprocess because jax x64 is process-global."""

import os
import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import opt_tpu as ot
from opt_tpu.models.specs import curve_fitting

ot.enable_double_precision()
N = 256
rng = np.random.RandomState(1)
xs = rng.rand(N) * 0.1
ys = 100.0 * np.cos(102.0 * xs) + 102.0 * np.sin(100.0 * xs)
inputs = {{
    "funcParams": np.array([[99.7, 102.3]], np.float64),
    "data": np.stack([xs, ys], -1),
    "G": {{"d": np.arange(N, dtype=np.int32), "p": np.zeros(N, np.int32)}},
}}
plan = ot.Problem(curve_fitting, kind="LMGPU").plan(
    dims={{"N": N, "U": 1}}, double_precision=True
)
res = plan.solve(inputs, nIterations=15, lIterations=40)
assert res.unknowns["funcParams"].dtype == np.float64, res.unknowns[
    "funcParams"
].dtype
got = np.asarray(res.unknowns["funcParams"])[0]
assert abs(got[0] - 100.0) < 1e-5 and abs(got[1] - 102.0) < 1e-5, got
# double precision converges past float32's floor on this problem
assert res.final_cost < 1e-15, res.final_cost
print("DOUBLE OK", got[0], got[1], res.final_cost)
"""


def test_double_precision_curve_fit(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "dp.py"
    script.write_text(_SCRIPT.format(repo=repo))
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "DOUBLE OK" in out.stdout
