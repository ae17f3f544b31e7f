"""The evaluation engine: forward + losses + measures for all five types.

TPU-native re-design of the reference's ``evaluate`` (cvae.py:523-917):

- one jittable pure function; no host sync, no ``.item()``
- the (L+1) latent-sample axis and the C class axis are broadcast dims:
  * per-class evaluation for cvae (labels not coded) touches only the prior
    and scoring math — the encoder/decoder run once per input and the class
    axis enters through ``all_classes`` prior broadcasts (vs the reference
    materializing a C x N input, cvae.py:589-599);
  * for y-coded types (xvae/jvae with y_is_coded) features are computed once
    and broadcast along C before the encoder (ref ``x_repeated_along_classes``).
- the IWAE estimate supports the reference's published estimator
  (``exp(delta).mean(0) + max`` — note the missing log, cvae.py:854-870,
  kept for parity under ``iws_mode='reference'``) and the mathematically
  correct log-mean-exp (``iws_mode='lme'``).

Loss shapes: per-class losses are (C, N); per-input losses are (N,); the
'total' loss broadcasts to the widest shape (ref cvae.py:744-902).
"""

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import mse_loss, categorical_loss, x_loss
from ..ops.priors import PriorConfig, prior_kl, prior_log_density
from ..ops.sampling import reparameterize
from ..ops.sigma import (SigmaState, update_sigma_rmse, update_sigma_coded,
                         sigma_value)
from .conv import space_to_depth
from .cvnet import CVNet, decode_native_f
from .layers import onehot_encoding, capacity, dict_min_distance

_LOG_2PI = float(np.log(2 * np.pi))


@flax.struct.dataclass
class EvalOutput:
    x_reco: jax.Array                  # (L+1, [C,] N, [256,] *input_shape)
    logits: jax.Array                  # ([C,] N, num_labels) — mean over samples 1:
    losses: Dict[str, jax.Array]       # each (N,) or (C, N)
    measures: Dict[str, jax.Array]     # scalar diagnostics for this batch
    mu: jax.Array
    log_var: jax.Array
    z: jax.Array
    sigma_state: SigmaState            # updated (rmse tracking / coded mean)


def _forward(model: CVNet, variables, x, y, *, rng, train, L, sampled,
             expand_x_classes: bool, mutable, decode_mean: bool = True,
             constrain_z=None, bn_eval: bool = False,
             native_decode: bool = False):
    """Run features -> encode -> sample -> decode -> classify through a
    single bound module so BN/dropout state works; returns raw tensors.

    ``bn_eval`` keeps the conv stacks' BatchNorm in inference mode (running
    averages) while everything else — including MLP dropout — behaves as
    training: the WIM fine-tuning semantics (ref FTJob._recurse_train,
    ft/job.py:98-111, which flips only BatchNorm2d modules to eval)."""
    cfg = model.cfg
    mtrain = train and not bn_eval    # conv/BN-stack flag only

    def run(mdl):
        t = mdl.features(x, mtrain)
        if expand_x_classes:
            t = jnp.broadcast_to(t[None], (cfg.num_labels,) + t.shape)
        y_onehot = None
        if cfg.y_is_coded:
            y_onehot = onehot_encoding(y, cfg.num_labels, cfg.dtype)
        mu, log_var, sigma_coded = mdl.encode(t, y_onehot, train)
        key = mdl.make_rng('sampling')
        dist = 'uniform' if cfg.prior.distribution == 'uniform' else 'gaussian'
        z, eps = reparameterize(key, mu, log_var, L, dist, sampled)
        if constrain_z is not None:
            # large-L eval: pin the sample axis to the mesh 'sample' dim so
            # the (L+1)-wide decode shards over it (parallel/mesh.py)
            z = constrain_z(z)
        if cfg.x_is_generated:
            # training never consumes the mean-sample reconstruction
            # (losses use x_reco[1:], ref cvae.py:649-660) — skip decoding
            # sample 0 under train: ~1/(L+1) of the decode FLOPs/bytes saved
            # (half, at the reference's default train L=1).  Scoring-only
            # callers (OOD engines) pass decode_mean=False for the same
            # saving at eval (1/17 of the decode at the default test L=16).
            x_reco = mdl.decode(z if (decode_mean and not train) else z[1:],
                                train, native=native_decode,
                                bn_train=mtrain)
        else:
            x_reco = x
        logits = mdl.classify(z)
        eps_norm = jnp.sum(jnp.square(eps.astype(jnp.float32)), axis=-1)
        return x_reco, logits, mu, log_var, z, eps_norm, sigma_coded

    rngs = {'sampling': rng}
    if cfg.dropout:
        rngs['dropout'] = jax.random.fold_in(rng, 1)
    if mutable:
        out, updates = model.apply(variables, rngs=rngs, mutable=['batch_stats'],
                                   method=lambda mdl: run(mdl))
        return out, updates
    out = model.apply(variables, rngs=rngs, method=lambda mdl: run(mdl))
    return out, None


def evaluate(model: CVNet, variables: Dict[str, Any], x: jax.Array,
             y: Optional[jax.Array] = None, *,
             rng: jax.Array,
             sigma_state: SigmaState,
             train: bool = False,
             with_beta: bool = False,
             kl_var_weighting: float = 1.0,
             gamma_weighting: float = 1.0,
             L: Optional[int] = None,
             compute_iws: Optional[bool] = None,
             prior_override: Optional[Tuple[PriorConfig, Dict[str, jax.Array]]] = None,
             return_bn_updates: bool = False,
             decode_mean: bool = True,
             constrain_z=None,
             bn_eval: bool = False,
             native_scores: bool = False):
    """Evaluate a batch; returns EvalOutput (and BN updates if requested).

    x: (N, *input_shape); y: (N,) int labels or None (per-class evaluation).

    ``native_scores=True`` (loss-only callers) lets the decoder keep its
    native packed-NHWC layout and computes the (permutation-invariant)
    reconstruction losses there, transforming the small true batch ``x``
    once instead of depth-to-space + NHWC->NCHW formatting every decoded
    sample.  When it engages (gaussian output, non-per-dim/non-coded sigma,
    packing-capable imager) ``EvalOutput.x_reco`` is in that native layout —
    callers that render reconstructions must leave it off.  Losses are
    identical up to float reduction order.  Measured on the v5e it wins in
    TRAIN steps (+1.3%: the backward re-pack transposes disappear) and
    LOSES ~2% in forward-only eval (the f32 loss epilogue fused into the
    conv slows the packed conv fusions more than the saved formatting) —
    so only the train-mode steps enable it (docs/BENCH.md).
    """
    cfg = model.cfg
    C = cfg.num_labels
    N = x.shape[0]
    x = x.astype(jnp.float32)

    y_in_input = y is not None
    x_rep = cfg.y_is_coded and not y_in_input
    per_class = cfg.losses_per_class and not y_in_input
    if compute_iws is None:
        compute_iws = not train
    if L is None:
        L = cfg.latent_sampling if train else cfg.test_latent_sampling
    # construction-time sampling flag (ref cvae.py:276): the TRAIN-time L
    # and beta decide whether the latent is stochastic; the eval-time L only
    # sets how many samples are drawn
    sampled = cfg.latent_sampling > 1 or cfg.beta > 0

    if prior_override is not None:
        prior_cfg, prior_params = prior_override
    else:
        prior_cfg = cfg.prior
        prior_params = variables['params']['prior']

    # labels fed to the net: built (C, N) grid when per-class and coded
    y_fwd = y
    if x_rep:
        y_fwd = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], (C, N))

    # native-layout scoring (see docstring): static decision.
    # ``native_scores`` may be a str carrying epilogue flags measured on the
    # v5e (docs/BENCH.md round 3): 'bf16' keeps the sub/square of the (L,...)
    # reconstruction loss in compute dtype (f32 accumulation), 'barrier'
    # puts an optimization_barrier between the decode and the loss so the
    # epilogue cannot fuse into (and slow) the packed conv fusions.
    ns_flags = native_scores if isinstance(native_scores, str) else ''
    nf = 0
    if (native_scores and cfg.x_is_generated
            and cfg.output_distribution == 'gaussian'
            and not cfg.sigma_cfg.per_dim and not cfg.sigma_cfg.coded):
        nf = decode_native_f(cfg)

    (x_reco, logits, mu, log_var, z, eps_norm, sigma_coded), bn_updates = _forward(
        model, variables, x, y_fwd, rng=rng, train=train, L=L, sampled=sampled,
        expand_x_classes=x_rep, mutable=return_bn_updates,
        decode_mean=decode_mean, constrain_z=constrain_z, bn_eval=bn_eval,
        native_decode=nf > 0)

    losses: Dict[str, jax.Array] = {}
    measures: Dict[str, jax.Array] = {}
    new_sigma_state = sigma_state

    D = int(np.prod(cfg.input_shape))
    scfg = cfg.sigma_cfg
    sigma_dims = D if scfg.per_dim else 1

    log_iws = None
    if cfg.x_is_generated:
        # sampled reconstructions (sample 0 = mean is not decoded in train
        # or when the caller asked to skip it)
        x_reco_s = x_reco[1:] if (decode_mean and not train) else x_reco
        # ---- sigma resolution (ref cvae.py:626-675) ----
        if scfg.coded:
            out_dim = scfg.output_dim
            s_log = sigma_coded.astype(jnp.float32).reshape(
                sigma_coded.shape[:-1] + tuple(out_dim))
            new_sigma_state = update_sigma_coded(scfg, sigma_state, s_log)
            sigma_div = jnp.exp(s_log)                       # per-sample, image-broadcast
            log_sigma_sum = jnp.sum(s_log.reshape(s_log.shape[:-len(out_dim)] + (-1,)),
                                    axis=-1)
        elif scfg.learned:
            s_log = variables['params']['sigma_param'].astype(jnp.float32)
            sigma_div = jnp.exp(s_log)                       # (sdim,)
            log_sigma_sum = jnp.sum(s_log)
            if scfg.per_dim:                 # (D,) -> image-broadcast shape
                sigma_div = sigma_div.reshape(cfg.input_shape)
        else:
            s_dat = sigma_state.data.astype(jnp.float32)
            sigma_div = s_dat
            log_sigma_sum = jnp.sum(jnp.log(jnp.maximum(s_dat, 1e-30)))
            if scfg.per_dim:
                sigma_div = sigma_div.reshape(cfg.input_shape)

        use_unit_sigma = scfg.is_rmse or cfg.output_distribution == 'categorical'

        x_flat = x
        if nf:
            # match the decoder's native layout: NHWC (+ space-to-depth
            # packing for nf > 1); sums/means over the 3 trailing image
            # dims are invariant to this pixel permutation
            x_nhwc = jnp.moveaxis(x, -3, -1)
            x_flat = space_to_depth(x_nhwc, nf) if nf > 1 else x_nhwc
            if 'barrier' in ns_flags:
                x_reco_s = jax.lax.optimization_barrier(x_reco_s)
        if cfg.output_distribution == 'gaussian':
            if use_unit_sigma:
                wmse_l = mse_loss(x_reco_s, x_flat, ndim=len(cfg.input_shape),
                                  batch_mean=False,
                                  low_precision='bf16' in ns_flags)
            elif nf:
                # the native path guarantees a SCALAR sigma (per_dim/coded
                # excluded above): hoist the 1/sigma^2 weighting out of the
                # (L, ...) elementwise epilogue onto the reduced means
                raw = mse_loss(x_reco_s, x_flat, ndim=len(cfg.input_shape),
                               batch_mean=False,
                               low_precision='bf16' in ns_flags)
                wmse_l = raw / jnp.square(sigma_div)
            else:
                wmse_l = mse_loss(x_reco_s / sigma_div, x_flat / sigma_div,
                                  ndim=len(cfg.input_shape), batch_mean=False)
        else:
            cat_ce_l = categorical_loss(x_reco_s, x_flat,
                                        ndim=len(cfg.input_shape), batch_mean=False)
            amax = jnp.argmax(x_reco_s, axis=-len(cfg.input_shape) - 1)
            wmse_l = mse_loss(amax.astype(jnp.float32) / 255.0, x_flat,
                              ndim=len(cfg.input_shape), batch_mean=False)

        if scfg.is_rmse:
            # per-item sigma^2 = mean over samples of the (unweighted) mse
            sigma2 = jnp.mean(wmse_l, axis=0)
            wmse_l = wmse_l / sigma2[None]
            log_sigma_sum = 0.5 * jnp.log(sigma2)            # per-item log sigma
            wmse = jnp.mean(wmse_l, axis=0)
            mse = wmse * sigma2
        else:
            wmse = jnp.mean(wmse_l, axis=0)
            if use_unit_sigma:
                mse = wmse
            else:
                mse = wmse * jnp.mean(jnp.square(sigma_div))

        losses['wmse'] = wmse
        measures['xpow'] = jnp.mean(jnp.square(x))
        measures['mse'] = jnp.mean(mse)

        # ---- cross_x: gaussian NLL or categorical CE (ref cvae.py:773-789) ----
        # ls = sum over image dims of log sigma (per item in rmse mode):
        # D*log(sigma) for scalar sigma, sum_d log(sigma_d) for per-dim.
        if cfg.output_distribution == 'gaussian':
            if scfg.is_rmse:
                ls = D * log_sigma_sum                        # per-item
            else:
                ls = log_sigma_sum * (D / sigma_dims)
            cross_x = 0.5 * D * (wmse + _LOG_2PI) + ls
            if compute_iws:
                log_iws = -0.5 * D * (wmse_l + _LOG_2PI) - ls
        else:
            cat_ce = jnp.mean(cat_ce_l, axis=0)
            cross_x = cat_ce
            if compute_iws:
                log_iws = -cat_ce_l

        losses['cross_x'] = cross_x
        if train and not scfg.coded:
            new_sigma_state = update_sigma_rmse(
                scfg, new_sigma_state, jnp.sqrt(jnp.maximum(measures['mse'], 0.0)))

    if cfg.x_is_generated and scfg.learned and not scfg.coded:
        # learned sigma lives in params (sigma_state.data stays at the
        # init); report the live rms value (ref Sigma.value, layers.py:118)
        measures['sigma'] = jnp.sqrt(jnp.mean(
            jnp.square(sigma_div.astype(jnp.float32))))
    else:
        measures['sigma'] = sigma_value(scfg, new_sigma_state)

    # ---- KL to the prior (ref cvae.py:711-729) ----
    y_for_prior = None
    all_classes = False
    if prior_cfg.conditional:
        if y_in_input:
            y_for_prior = y
        elif x_rep:
            y_for_prior = y_fwd                      # (C, N) grid, gather path
        else:
            all_classes = True                        # broadcast path (cvae)
    kl_components = prior_kl(prior_cfg, prior_params, mu, log_var,
                             y=y_for_prior, var_weighting=kl_var_weighting,
                             all_classes=all_classes)
    losses['kl'] = kl_components['kl']
    losses['zdist'] = kl_components['distance']
    losses['var_kl'] = kl_components['var_kl']
    measures['zdist'] = jnp.mean(kl_components['distance'])
    measures['var_kl'] = jnp.mean(kl_components['var_kl'])

    # ---- class-dictionary diagnostics (ref cvae.py:747-762) ----
    if prior_cfg.conditional:
        dictionary = prior_params['mean']
        dict_mean = jnp.mean(dictionary, axis=0)
        zdist_to_mean = jnp.sum(jnp.square(mu.astype(jnp.float32) - dict_mean),
                                axis=-1)
        dict_norm_var = (jnp.mean(jnp.sum(jnp.square(dictionary), axis=1))
                         - jnp.sum(jnp.square(dict_mean)))
        losses['dzdist'] = zdist_to_mean + dict_norm_var
        measures['imut-zy'] = capacity(dictionary, C)
        measures['ld-norm'] = jnp.mean(jnp.square(dictionary))
        measures['d-mind'] = dict_min_distance(dictionary)

    # ---- cross_y (ref cvae.py:731-741) ----
    if cfg.y_is_decoded:
        y_for_xloss = None if (per_class and not cfg.y_is_coded) else y_fwd
        losses['cross_y'] = x_loss(y_for_xloss, logits, batch_mean=False)

    # ---- IWAE importance weights (ref cvae.py:793-873) ----
    if compute_iws and cfg.x_is_generated:
        z1 = z[1:].astype(jnp.float32)                # (L, [C,] N, K)
        if prior_cfg.conditional:
            if x_rep:
                yls = jnp.broadcast_to(y_fwd, (L,) + y_fwd.shape)
                log_p_z_y = prior_log_density(prior_cfg, prior_params, z1, y=yls)
            elif y_in_input:
                log_p_z_y = prior_log_density(prior_cfg, prior_params, z1, y=y)
            else:
                # (C, L, N) -> (L, C, N)
                log_p_z_y = jnp.moveaxis(
                    prior_log_density(prior_cfg, prior_params, z1,
                                      all_classes=True), 0, 1)
        else:
            log_p_z_y = prior_log_density(prior_cfg, prior_params, z1)

        K = log_var.shape[-1]
        log_inv_q = (0.5 * (eps_norm + jnp.sum(log_var.astype(jnp.float32), axis=-1))
                     + 0.5 * K * _LOG_2PI)            # (L, [C,] N)

        liw = log_iws
        # align a class axis if the prior added one
        while liw.ndim < log_p_z_y.ndim:
            liw = jnp.expand_dims(liw, 1)
        liw = liw + log_p_z_y
        liq = log_inv_q
        while liq.ndim < liw.ndim:
            liq = jnp.expand_dims(liq, 1)
        liw = liw + liq

        m = jnp.max(liw, axis=0)
        d = jnp.exp(liw - m[None])
        if cfg.iws_mode == 'reference':
            # published estimator: mean(exp(delta)) + max (no log, cvae.py:870)
            iws = jnp.mean(d, axis=0) + m
        else:
            iws = jnp.log(jnp.mean(d, axis=0)) + m
        if 'iws' in cfg.loss_components:
            losses['iws'] = iws

    # ---- total (ref cvae.py:744, 875-902) ----
    total = jnp.zeros_like(losses['kl'])
    if cfg.x_is_generated:
        total = total + losses['cross_x']
    if cfg.y_is_decoded:
        # inclusion is static (gamma != 0, and training only for cvae/vae —
        # ref cvae.py:557-562); the warmup weighting itself may be traced
        include_cross_y = bool(cfg.gamma) and (train or not (cfg.is_cvae or cfg.is_vae))
        if include_cross_y:
            total = total + (gamma_weighting * cfg.gamma) * losses['cross_y']
    beta = cfg.beta if with_beta else 1.0
    total = total + beta * losses['kl']
    losses['total'] = total

    logits_out = (jnp.mean(logits[1:], axis=0) if logits.shape[0] > 1
                  else logits[0])

    out = EvalOutput(x_reco=x_reco, logits=logits_out, losses=losses,
                     measures=measures, mu=mu, log_var=log_var, z=z,
                     sigma_state=new_sigma_state)
    if return_bn_updates:
        return out, bn_updates
    return out
