"""Differentiable SpMV: custom-VJP operator and live-values path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spmv_tpu import CSR
from spmv_tpu.io.generate import power_law_csr, random_csr
from spmv_tpu.ops.autodiff import (
    SparseOperator,
    spmv_value_grad,
    spmv_values,
)


@pytest.fixture(scope="module")
def small():
    A = random_csr(64, 48, nnz=400, seed=3)
    x = np.random.default_rng(7).standard_normal(48).astype(np.float32)
    return A, x


def _dense(A):
    return jnp.asarray(A.to_dense())


class TestSparseOperator:
    def test_forward_matches_dense(self, small):
        A, x = small
        op = SparseOperator(A, kind="xla")
        np.testing.assert_allclose(op(x), _dense(A) @ x, rtol=1e-4, atol=1e-5)

    def test_grad_matches_dense(self, small):
        A, x = small
        op = SparseOperator(A, kind="xla")
        D = _dense(A)

        def loss_sparse(v):
            return jnp.sum(op(v) ** 2)

        def loss_dense(v):
            return jnp.sum((D @ v) ** 2)

        gs = jax.grad(loss_sparse)(jnp.asarray(x))
        gd = jax.grad(loss_dense)(jnp.asarray(x))
        np.testing.assert_allclose(gs, gd, rtol=1e-4, atol=1e-5)

    def test_grad_under_jit(self, small):
        A, x = small
        op = SparseOperator(A, kind="xla")
        g = jax.jit(jax.grad(lambda v: jnp.sum(op(v))))(jnp.asarray(x))
        # grad of sum(Av) is A^T @ ones
        expect = _dense(A).T @ jnp.ones(A.n_rows)
        np.testing.assert_allclose(g, expect, rtol=1e-4, atol=1e-5)

    def test_transpose_operator(self, small):
        A, _ = small
        op = SparseOperator(A, kind="xla")
        y = np.random.default_rng(1).standard_normal(A.n_rows).astype(np.float32)
        np.testing.assert_allclose(op.T(y), _dense(A).T @ y, rtol=1e-3,
                                   atol=1e-5)
        assert op.T.T is op
        assert op.T.shape == (A.n_cols, A.n_rows)

    def test_rmatvec(self, small):
        A, _ = small
        op = SparseOperator(A, kind="xla")
        y = np.ones(A.n_rows, np.float32)
        np.testing.assert_allclose(op.rmatvec(y), _dense(A).T @ y,
                                   rtol=1e-4, atol=1e-5)

    def test_fast_kind_grad(self):
        # The custom VJP must hold for planned Pallas kinds too.
        A = power_law_csr(512, 512, nnz=4096, alpha=1.3, seed=11)
        x = np.random.default_rng(2).standard_normal(512).astype(np.float32)
        op = SparseOperator(A, kind="merge")
        gs = jax.grad(lambda v: jnp.sum(op(v) ** 2))(jnp.asarray(x))
        D = _dense(A)
        gd = jax.grad(lambda v: jnp.sum((D @ v) ** 2))(jnp.asarray(x))
        np.testing.assert_allclose(gs, gd, rtol=1e-3, atol=1e-4)


class TestSpmvValues:
    def test_forward(self, small):
        A, x = small
        y = spmv_values(A, np.asarray(A.Ax), x)
        np.testing.assert_allclose(y, _dense(A) @ x, rtol=1e-4, atol=1e-5)

    def test_value_grad_matches_dense(self, small):
        A, x = small
        Ax = jnp.asarray(np.asarray(A.Ax))
        xj = jnp.asarray(x)

        def loss(vals):
            return jnp.sum(spmv_values(A, vals, xj) ** 2)

        g = jax.grad(loss)(Ax)
        # dense equivalent: dL/dD = 2 (Dx) x^T, sampled at the pattern
        D = _dense(A)
        gD = jax.grad(lambda M: jnp.sum((M @ xj) ** 2))(D)
        rows = A.row_ids()
        cols = np.asarray(A.Aj)
        np.testing.assert_allclose(g, np.asarray(gD)[rows, cols],
                                   rtol=1e-4, atol=1e-5)

    def test_both_args_grad(self, small):
        A, x = small
        Ax = jnp.asarray(np.asarray(A.Ax))
        gx = jax.grad(lambda v: jnp.sum(spmv_values(A, Ax, v)))(jnp.asarray(x))
        np.testing.assert_allclose(gx, _dense(A).T @ jnp.ones(A.n_rows),
                                   rtol=1e-4, atol=1e-5)

    def test_jvp_works(self, small):
        # Forward mode must survive too (plain-jnp path, no custom_vjp).
        A, x = small
        Ax = jnp.asarray(np.asarray(A.Ax))
        xj = jnp.asarray(x)
        y, dy = jax.jvp(lambda v: spmv_values(A, Ax, v), (xj,), (xj,))
        np.testing.assert_allclose(dy, _dense(A) @ xj, rtol=1e-4, atol=1e-5)

    def test_shape_check(self, small):
        A, x = small
        with pytest.raises(ValueError, match="pattern"):
            spmv_values(A, np.ones(A.nnz + 1, np.float32), x)

    def test_value_grad_helper(self, small):
        A, x = small
        g = np.random.default_rng(5).standard_normal(A.n_rows).astype(np.float32)
        got = spmv_value_grad(A, x, g)
        expect = g[A.row_ids()] * np.asarray(x)[np.asarray(A.Aj)]
        np.testing.assert_allclose(got, expect, rtol=1e-6)
