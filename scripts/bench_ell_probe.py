import time, sys, numpy as np
import jax, jax.numpy as jnp, optax
from difformer_tpu.nn import DIFFormer
from difformer_tpu.ops.ell import build_ell_gcn
from difformer_tpu.train.optim import torch_adam

N, E, F, C, LAYERS, STEPS = 131072, 4*1024*1024, 64, 112, 3, 8
rng = np.random.default_rng(0)
x = rng.normal(size=(N, F)).astype(np.float32)
senders = rng.integers(0, N, E).astype(np.int32)
receivers = rng.integers(0, N, E).astype(np.int32)
y = rng.integers(0, 2, size=(N, C)).astype(np.float32)
print('# building ELL...', file=sys.stderr, flush=True)
t0=time.time()
ell = build_ell_gcn(senders, receivers, N)
print(f'# ELL built in {time.time()-t0:.1f}s buckets={ell[0].bucket_sizes}', file=sys.stderr, flush=True)

model = DIFFormer(hidden_channels=64, out_channels=C, num_layers=LAYERS, dropout=0.0)
xs, labels = jnp.asarray(x), jnp.asarray(y)
s = jnp.asarray(senders); r = jnp.asarray(receivers)
tx = torch_adam(1e-2, 0.0)
def loss(params):
    out = model.apply({"params": params}, xs, s, r, train=False, ell=ell)
    return optax.sigmoid_binary_cross_entropy(out, labels).mean()
@jax.jit
def multi(params, opt_state):
    def body(c, _):
        p, o = c
        l, g = jax.value_and_grad(loss)(p)
        u, o = tx.update(g, o, p)
        return (optax.apply_updates(p, u), o), l
    (p, o), ls = jax.lax.scan(body, (params, opt_state), None, length=STEPS)
    return p, o, ls[-1]
variables = model.init(jax.random.PRNGKey(0), xs, s[:128], r[:128], train=False)
params = variables["params"]; opt_state = tx.init(params)
t0=time.time(); p1,o1,l = multi(params, opt_state); float(l)
print(f'# ell compile+{STEPS} steps {time.time()-t0:.1f}s', file=sys.stderr, flush=True)
t0=time.time(); p2,o2,l = multi(p1,o1); float(l)
dt=(time.time()-t0)/STEPS
print(f'# ell {dt*1e3:.1f} ms/step -> {E*LAYERS/dt/1e6:.1f}M edges/s', flush=True)
