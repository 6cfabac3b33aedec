"""Inverse problem via differentiable solves: recover a source term from a
noisy observation of the PDE solution — a capability with no reference
counterpart (PETSc solves are opaque; here gradients flow through the Krylov
solve via one adjoint solve, `neptune_tpu.solvers.diff`).

We observe u_obs ≈ A⁻¹ f_true for the (shifted) Poisson operator A and
recover f by minimizing ||A⁻¹ f − u_obs||² with Adam-free plain gradient
descent — each gradient evaluation costs one forward and one adjoint solve.

Run: python examples/inverse_problem.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import neptune_tpu as ntp

N = 48


@ntp.linear_op_def(bounds=([0, 0], [N, N]), interior=([1, 1], [N - 1, N - 1]))
def A(u):
    # shifted Poisson (well-conditioned): 0.1 u + lap(u)
    return 0.1 * u[0, 0] + 4.0 * u[0, 0] - u[-1, 0] - u[1, 0] - u[0, -1] - u[0, 1]


def main():
    mv = ntp.get_context().compiled().opdef("A")

    # ground truth: two gaussian sources
    xx, yy = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    f_true = np.exp(-((xx - 15) ** 2 + (yy - 15) ** 2) / 20.0) - 0.7 * np.exp(
        -((xx - 32) ** 2 + (yy - 30) ** 2) / 30.0
    )
    f_true = jnp.asarray(f_true)

    def forward(f):
        return ntp.differentiable_solve(
            mv, f, solver="cg", symmetric=True, tol=1e-12, maxiter=3000
        )

    u_obs = forward(f_true)
    u_obs = u_obs + 1e-4 * jax.random.normal(jax.random.PRNGKey(0), u_obs.shape)

    def loss(f):
        return jnp.mean((forward(f) - u_obs) ** 2)

    grad = jax.jit(jax.grad(loss))
    lossj = jax.jit(loss)

    f = jnp.zeros((N, N))
    lr = 10.0
    print("recovering the source term by gradient descent through the solver:")
    for it in range(200):
        f = f - lr * grad(f)
        if it % 40 == 0:
            err = float(jnp.abs(f - f_true).max())
            print(f"  iter {it:3d}: loss={float(lossj(f)):.3e}  max|f-f_true|={err:.3f}")

    err = float(jnp.abs(f - f_true).max())
    rel = err / float(jnp.abs(f_true).max())
    print(f"final max error {err:.4f} ({rel:.1%} of peak source)")


if __name__ == "__main__":
    main()
