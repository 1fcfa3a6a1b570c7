"""docs/EXTENDING.md runs end-to-end: the third-party extension contract
(reference doc/general/extensions.rst — pycsou-sphere/pycsou-gsp subclass
LinearOperator and plug into the same solvers)."""
import jax
import jax.numpy as jnp
import numpy as np

from pycsou_tpu.core.linop import LinearOperator
from pycsou_tpu.func import SquaredL2Loss
from pycsou_tpu.func.penalty import L1Norm
from pycsou_tpu.opt import PDS


class GraphGradient(LinearOperator):
    """Signed incidence operator (docs/EXTENDING.md worked example)."""

    edges: jax.Array = None
    weights: jax.Array = None

    def __init__(self, n_nodes: int, edges, weights=None):
        edges = jnp.asarray(edges, jnp.int32)
        E = edges.shape[0]
        w = jnp.ones((E,), jnp.float32) if weights is None else jnp.asarray(weights, jnp.float32)
        deg = np.zeros(n_nodes)
        np.add.at(deg, np.asarray(edges).ravel(), np.repeat(np.asarray(w) ** 2, 2))
        super().__init__((n_nodes,), (E,), lipschitz=float(np.sqrt(2 * deg.max())))
        self.edges = edges
        self.weights = w

    def apply(self, x):
        x = jnp.asarray(x)
        return self.weights * (x[self.edges[:, 1]] - x[self.edges[:, 0]])


class GraphLaplacian(LinearOperator):
    grad: GraphGradient = None

    def __init__(self, grad: GraphGradient):
        super().__init__(grad.dim_shape, grad.dim_shape, lipschitz=grad.lipschitz**2)
        self.grad = grad

    def apply(self, x):
        return self.grad.adjoint(self.grad.apply(x))


def _ring_graph(n):
    edges = np.stack([np.arange(n), (np.arange(n) + 1) % n], axis=1)
    return edges


def test_graph_gradient_dot_test(rng):
    n = 24
    G = GraphGradient(n, _ring_graph(n))
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    np.testing.assert_allclose(
        float(jnp.vdot(G.apply(x), y)), float(jnp.vdot(x, G.adjoint(y))), rtol=1e-5
    )


def test_graph_gradient_lipschitz_bound():
    n = 24
    G = GraphGradient(n, _ring_graph(n))
    est = G.compute_lipschitz_cst()
    assert est <= G.lipschitz * (1 + 1e-4)
    # ring-graph gradient spectral norm is exactly 2
    np.testing.assert_allclose(est, 2.0, rtol=1e-2)


def test_graph_laplacian_matches_dense():
    n = 16
    G = GraphGradient(n, _ring_graph(n))
    L = GraphLaplacian(G)
    Ld = L.todense().mat
    # ring Laplacian: 2 on the diagonal, -1 on the cyclic off-diagonals
    expect = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    expect[0, -1] = expect[-1, 0] = -1
    np.testing.assert_allclose(np.asarray(Ld), expect, atol=1e-5)


def test_graph_tv_denoising_with_generic_pds(rng):
    """The extension operator drives the stock PDS solver unchanged."""
    n = 32
    edges = _ring_graph(n)
    x_true = jnp.asarray(np.repeat([0.0, 1.0], n // 2), jnp.float32)
    y = x_true + 0.1 * jnp.asarray(rng.standard_normal(n), jnp.float32)
    G = GraphGradient(n, edges)
    solver = PDS(
        (n,),
        F=SquaredL2Loss((n,), data=y),
        H=0.3 * L1Norm((n,)),
        K=G,
        max_iter=400,
        accuracy_threshold=1e-7,
        min_iter=50,
    )
    info = solver.solve()
    x = np.asarray(info["x"])
    # graph-TV flattens the noise within each constant segment
    assert np.abs(np.diff(x[3 : n // 2 - 3])).max() < 1e-3
    assert np.linalg.norm(x - np.asarray(x_true)) < np.linalg.norm(
        np.asarray(y - x_true)
    )
