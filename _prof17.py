import time, numpy as np, jax, jax.numpy as jnp
import gauss_tpu
rng = np.random.default_rng(0)

def qb(f, *a, n=20):
    float(np.asarray(jax.tree_util.tree_leaves(f(*a))[0]).ravel()[0])
    t=time.time()
    for _ in range(n): out=f(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.time()-t)/n

Mp, Up = 1280, 1024
for B in (1, 2, 4, 8):
    A = rng.standard_normal((B, Mp, Mp)).astype(np.float32)*0.01
    A = (A + A.transpose(0,2,1))/2 + np.eye(Mp, dtype=np.float32)[None]*1.1
    B21 = rng.standard_normal((B, Up, Mp)).astype(np.float32)
    f = jax.jit(lambda A, B21: jnp.sum(jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(A), True), B21.transpose(0,2,1))))
    dt = qb(f, jnp.asarray(A), jnp.asarray(B21))
    print(f"B={B}: chol+solve {dt*1e3:7.2f} ms total, {dt/B*1e3:6.2f} ms/window")
