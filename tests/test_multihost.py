"""True multi-process (multi-host analogue) solve: two processes, each with
4 virtual CPU devices, form one 8-device global mesh via jax.distributed
(parallel/distributed.py) — the same code path a TPU pod slice uses over
DCN. Both processes must agree with each other and with the single-process
solve (SURVEY §2.4 / BASELINE north star: ≥2-host scaling path)."""

import os
import re
import subprocess
import sys
import socket

import numpy as np

import opt_tpu as ot
from opt_tpu.models.specs import poisson_image_editing

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import opt_tpu as ot
import opt_tpu.parallel.distributed as dist
from opt_tpu.models.specs import poisson_image_editing
from opt_tpu.parallel.mesh import make_mesh

dist.initialize(
    coordinator_address="localhost:" + port, num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
n = 48
rng = np.random.RandomState(0)
mask = np.ones((n, n), np.float32); mask[8:-8, 8:-8] = 0
inputs = {{"X": rng.rand(n, n, 4).astype(np.float32),
           "T": rng.rand(n, n, 4).astype(np.float32), "M": mask}}
mesh = make_mesh()
plan = ot.Problem(poisson_image_editing).plan(dims={{"W": n, "H": n}}, mesh=mesh)
res = plan.solve(dict(inputs), nIterations=1, lIterations=50)
print("MHCOST", pid, repr(float(res.final_cost)), flush=True)
"""


def test_two_process_solve_matches_single_process(tmp_path):
    n = 48
    rng = np.random.RandomState(0)
    mask = np.ones((n, n), np.float32)
    mask[8:-8, 8:-8] = 0
    inputs = {
        "X": rng.rand(n, n, 4).astype(np.float32),
        "T": rng.rand(n, n, 4).astype(np.float32),
        "M": mask,
    }
    ref = ot.Problem(poisson_image_editing).plan(dims={"W": n, "H": n}).solve(
        dict(inputs), nIterations=1, lIterations=50
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    costs = []
    for out in outs:
        m = re.search(r"MHCOST \d+ (\S+)", out)
        assert m, out
        costs.append(float(m.group(1)))
    assert np.isclose(costs[0], costs[1], rtol=0), costs
    assert np.isclose(costs[0], ref.final_cost, rtol=1e-4), (
        costs,
        ref.final_cost,
    )
