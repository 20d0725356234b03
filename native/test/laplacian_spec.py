"""Energy spec loaded by the C API test client (the analogue of the
reference's tests/minimal/laplacian.t)."""


def spec(S):
    W, H = S.Dim("W"), S.Dim("H")
    X = S.Unknown("X", 1, (W, H))
    A = S.Array("A", 1, (W, H))
    S.Energy(
        0.2 * (X(0, 0) - A(0, 0)),
        X(0, 0) - X(1, 0),
        X(0, 0) - X(0, 1),
    )
