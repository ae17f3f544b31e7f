import time

def test_probe():
    t0 = time.time()
    import jax, jax.numpy as jnp
    print('import jax %.1f' % (time.time()-t0)); t0 = time.time()
    x = jnp.ones((4, 4)).sum()
    x.block_until_ready()
    print('first op %.1f' % (time.time()-t0)); t0 = time.time()
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4,3,5,1,7,7)).astype('float32')
    b = rng.normal(size=(5,1,7,7)).astype('float32')
    from joint_vae_tpu.ops.losses import mse_loss
    r = mse_loss(jnp.array(a), jnp.array(b), ndim=3, batch_mean=False)
    np.asarray(r)
    print('mse eager %.1f' % (time.time()-t0)); t0 = time.time()
    import torch
    print('torch import %.1f' % (time.time()-t0))
