

def test_convergence_analysis_graph_format(tmp_path):
    """ConvergenceAnalysis matches the reference's saveGraph layout
    (shape_from_shading/src/ConvergenceAnalysis.h:64-77): row of
    timestamps, row of costs, tab-separated; saving resets."""
    from opt_tpu.harness import ConvergenceAnalysis

    ca = ConvergenceAnalysis()
    for c in (10.0, 4.5, 2.25):
        ca.add_sample(c)
    p = tmp_path / "sfs.graph"
    ca.save_graph(str(p))
    rows = p.read_text().splitlines()
    assert rows[0].split("\t") == ["0", "1", "2"]
    assert [float(x) for x in rows[1].split("\t")] == [10.0, 4.5, 2.25]
    assert ca.samples == []  # reset after save


def test_save_convergence_graphs_per_run(tmp_path):
    """CombinedSolverBase.save_convergence_graphs writes one graph per
    solver run from its per-iteration costs."""
    from opt_tpu.harness import (
        CombinedSolverBase,
        SolverIteration,
        SolverRun,
    )

    class Dummy(CombinedSolverBase):
        def combined_solve_init(self):
            pass

    def myspec(S):
        pass

    s = Dummy(myspec, {}, {})
    for nm, costs in [("Opt(GN)", [3.0, 1.0]), ("Opt(LM)", [3.0, 0.5])]:
        run = SolverRun(name=nm)
        run.iterations = [SolverIteration(c, 1.0) for c in costs]
        s.runs.append(run)
    paths = s.save_convergence_graphs(str(tmp_path))
    assert len(paths) == 2
    for p, costs in zip(paths, ([3.0, 1.0], [3.0, 0.5])):
        rows = open(p).read().splitlines()
        assert [float(x) for x in rows[1].split("\t")] == costs
