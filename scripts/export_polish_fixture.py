"""Re-export the reference's Mosek-solved polish fixture to npz.

The reference ships test/problem_data/random_polish_qp.jld2 (loaded at
/root/reference/test/polishing.jl:72-79): a random n=30, m=50 QP together
with a Mosek-computed optimal solution (x_test, y_test, obj_test). JLD2 is
an HDF5 container, so the numeric payload is readable with h5py; this
script converts it once into tests/data/random_polish_qp.npz (P densified
and symmetrized from its upper-triangular CSC storage, Julia 1-based
indices shifted to 0-based).

This is test DATA (the external-oracle contract to match), not code.
Sanity checks performed on export: obj(x_test) == obj_test to 1e-12,
primal feasibility and stationarity of (x_test, y_test) to ~1e-12.

Usage: python scripts/export_polish_fixture.py
"""

import os

import h5py
import numpy as np
import scipy.sparse as sp

REF = "/root/reference/test/problem_data/random_polish_qp.jld2"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "random_polish_qp.npz")


def read_csc(f, name):
    rec = f[name][()]  # JLD2 compound: m, n, colptr(ref), rowval(ref), nzval(ref)
    m, n = int(rec["m"]), int(rec["n"])
    colptr = f[rec["colptr"]][()].astype(np.int64) - 1
    rowval = f[rec["rowval"]][()].astype(np.int64) - 1
    nzval = f[rec["nzval"]][()].astype(np.float64)
    return sp.csc_matrix((nzval, rowval, colptr), shape=(m, n))


def main():
    with h5py.File(REF, "r") as f:
        P = read_csc(f, "P").toarray()
        A = read_csc(f, "A").toarray()
        q, l, u = f["q"][()], f["l"][()], f["u"][()]
        x_test, y_test = f["x_test"][()], f["y_test"][()]
        obj_test = float(f["obj_test"][()])

    if not np.allclose(P, P.T):
        P = np.triu(P) + np.triu(P, 1).T

    obj = 0.5 * x_test @ (P @ x_test) + q @ x_test
    assert abs(obj - obj_test) < 1e-9, (obj, obj_test)
    Ax = A @ x_test
    assert max((Ax - u).max(), (l - Ax).max()) < 1e-9
    assert np.linalg.norm(P @ x_test + q + A.T @ y_test, np.inf) < 1e-9

    np.savez(os.path.abspath(OUT), P=P, A=A, q=q, l=l, u=u,
             x_test=x_test, y_test=y_test, obj_test=obj_test)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
