"""Port of the mod-cache unit tests (/root/reference/test/MOI_wrapper.jl:95-205):
dirty-bit semantics, sparsity-pattern-violation errors, row zeroing, and the
compiled (vals, inds) flush format."""

import numpy as np
import pytest

from osqp_tpu.modcaches import (MatrixModificationCache,
                                ProblemModificationCache,
                                VectorModificationCache, WarmStartCache)


def test_vector_cache_dirty_flush():
    c = VectorModificationCache(np.array([1.0, 2.0, 3.0]))
    flushed = []
    assert not c.process_updates(flushed.append)
    c[1] = 5.0
    assert c.dirty
    assert c.process_updates(flushed.append)
    assert not c.dirty
    np.testing.assert_array_equal(flushed[0], [1.0, 5.0, 3.0])
    # flush again: no-op
    assert not c.process_updates(flushed.append)
    assert len(flushed) == 1


def test_matrix_cache_pattern_violation():
    # pattern: (0,0), (1,1) of a 2x2
    c = MatrixModificationCache(np.array([0, 1]), np.array([0, 1]))
    c[(0, 0)] = 4.0
    with pytest.raises(ValueError, match="sparsity pattern"):
        c[(0, 1)] = 1.0
    assert c.dirty


def test_matrix_cache_flush_compiles_vals_inds():
    rows = np.array([0, 2, 1])
    cols = np.array([0, 0, 1])
    c = MatrixModificationCache(rows, cols)
    c[(1, 1)] = 7.0
    c[(0, 0)] = 3.0
    out = {}

    def flush(vals, inds):
        out["vals"], out["inds"] = vals, inds

    assert c.process_updates(flush)
    np.testing.assert_array_equal(out["inds"], [0, 2])
    np.testing.assert_array_equal(out["vals"], [3.0, 7.0])
    assert not c.dirty


def test_matrix_cache_zero_row():
    rows = np.array([0, 1, 1])
    cols = np.array([0, 0, 1])
    c = MatrixModificationCache(rows, cols)
    c.zero_row(1)
    out = {}
    c.process_updates(lambda v, i: out.update(vals=v, inds=i))
    np.testing.assert_array_equal(out["inds"], [1, 2])
    np.testing.assert_array_equal(out["vals"], [0.0, 0.0])


def test_problem_cache_joint_lu_flush():
    # modcaches.jl:167-172: l and u must flush jointly (crossing pair)
    pc = ProblemModificationCache(
        np.array([0]), np.array([0]), np.zeros(1),
        np.array([0]), np.array([0]), np.array([0.0]), np.array([1.0]))
    calls = []

    class FakeModel:
        def update(self, **kw):
            calls.append(kw)

    # new l exceeds old u: must arrive in one update call
    pc.l[0] = 5.0
    pc.u[0] = 9.0
    pc.process_updates(FakeModel())
    assert len(calls) == 1
    assert calls[0]["l"][0] == 5.0 and calls[0]["u"][0] == 9.0


def test_warm_start_cache_joint_flush():
    wc = WarmStartCache(2, 3)
    calls = []

    class FakeModel:
        def warm_start(self, x=None, y=None):
            calls.append((np.array(x), np.array(y)))

    wc.process_updates(FakeModel())
    assert not calls  # nothing dirty
    wc.x[0] = 1.0
    wc.process_updates(FakeModel())
    # joint flush: y pushed too (zeros) so the solver doesn't zero it silently
    assert len(calls) == 1
    assert calls[0][1].shape == (3,)
    # set_from_solution does NOT set dirty (MOI_wrapper.jl:572-574)
    wc.set_from_solution(np.ones(2), np.ones(3))
    wc.process_updates(FakeModel())
    assert len(calls) == 1
