r"""CVNet — the one model covering the five types (vae / cvae / jvae / xvae / vib).

TPU-native re-design of the reference's ``ClassificationVariationalNetwork``
(cvae.py:60-424).  The torch god-class is split into:

- :class:`CVNetConfig` — static, hashable configuration carrying the
  per-type tables (loss components, predict/OOD/misclass methods, metrics —
  ref cvae.py:82-118) and the architecture dict for params.json parity;
- :class:`CVNet` — a flax module exposing ``features`` / ``encode`` /
  ``decode`` / ``classify`` / ``prior`` sub-applies plus a convenience
  ``__call__`` full forward;
- the loss/evaluation math in ``models/evaluate.py`` (pure functions).

X -- features --- encoder -- Z -- decoder -- imager -- X^
              /                \
           Y_/                  \-- classifier -- Y^
"""

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.priors import PriorConfig, build_prior_config
from ..ops.sigma import SigmaConfig
from .conv import ConvStack, conv_stack_plan, find_input_shape, ACTIVATIONS
from .layers import Encoder, Classifier, MLP, PriorParams, onehot_encoding

VERSION = '1.0'
DEFAULT_ACTIVATION = 'relu'
DEFAULT_OUTPUT_ACTIVATION = 'sigmoid'
DEFAULT_LATENT_SAMPLING = 100

LOSS_COMPONENTS_PER_TYPE = {
    'jvae': ('cross_x', 'kl', 'cross_y', 'total'),
    'cvae': ('cross_x', 'kl', 'total', 'zdist', 'var_kl', 'dzdist', 'iws',
             'sigma', 'wmse', 'z_logdet', 'z_tr_inv_cov'),
    'xvae': ('cross_x', 'kl', 'total', 'zdist', 'iws'),
    'vae': ('cross_x', 'kl', 'zdist', 'var_kl', 'total', 'iws'),
    'vib': ('cross_y', 'kl', 'total'),
}

PREDICT_METHODS_PER_TYPE = {
    'jvae': ['loss', 'esty'],
    'cvae': ['iws', 'closest'],
    'xvae': ['loss', 'closest'],
    'vae': [],
    'vib': ['esty'],
}

METRICS_PER_TYPE = {
    'jvae': ['rmse', 'dB', 'sigma'],
    'cvae': ['rmse', 'dB', 'd-mind', 'ld-norm', 'sigma'],
    'xvae': ['rmse', 'dB', 'zdist', 'd-mind', 'ld-norm', 'sigma'],
    'vae': ['rmse', 'dB', 'sigma'],
    'vib': ['sigma'],
}

OOD_METHODS_PER_TYPE = {
    'cvae': ['iws-2s', 'iws-a-1-1', 'iws-a-4-1', 'iws', 'mse', 'elbo', 'soft',
             'elbo-2s', 'elbo-a-1-1', 'elbo-a-4-1', 'zdist'],
    'xvae': ['max', 'mean', 'std'],
    'jvae': ['max', 'sum', 'std'],
    'vae': ['iws', 'iws-2s', 'iws-a-1-1', 'iws-a-4-1',
            'elbo', 'elbo-2s', 'elbo-a-1-1', 'elbo-a-4-1', 'zdist'],
    'vib': ['odin*', 'baseline', 'logits'],
}

MISCLASS_METHODS_PER_TYPE = {
    'cvae': ['softkl*', 'iws', 'softiws*', 'kl', 'max', 'zdist', 'softzdist*',
             'baseline*', 'hyz'],
    'xvae': [],
    'jvae': [],
    'vae': [],
    'vib': ['odin*', 'baseline', 'logits', 'hyz'],
}

# ODIN parameter grids (ref cvae.py:120-133)
ODIN_TEMPS = [t * 10 ** i for i in (0, 1, 2) for t in (1, 2, 5)] + [1000]
ODIN_EPS = [e / 20 * 0.004 for e in range(21)]

METHODS_PARAMS: Dict[str, list] = {
    'odin': ['odin-{:.0f}-{:.4f}'.format(T, e) for T in ODIN_TEMPS for e in ODIN_EPS],
}
for _k in ('softkl', 'softzdist', 'softiws', 'baseline'):
    METHODS_PARAMS[_k] = ['{}-{:.0f}'.format(_k, T) for T in ODIN_TEMPS]


@dataclasses.dataclass(frozen=True)
class CVNetConfig:
    input_shape: Tuple[int, ...]
    num_labels: int
    type: str = 'cvae'
    y_is_coded: bool = False
    output_distribution: str = 'gaussian'   # gaussian | categorical
    features: Optional[str] = None          # conv DSL string or named arch
    batch_norm: Any = False                 # False | 'encoder' | 'both'
    dropout: float = 0.0
    encoder: Tuple[int, ...] = (36,)
    latent_dim: int = 32
    prior: PriorConfig = None
    beta: float = 1.0
    gamma: float = 0.0
    decoder: Tuple[int, ...] = (36,)
    upsampler: Optional[str] = None
    classifier: Tuple = (36,)
    name: str = 'joint-vae'
    activation: str = DEFAULT_ACTIVATION
    latent_sampling: int = DEFAULT_LATENT_SAMPLING
    test_latent_sampling: int = 0           # 0 -> same as latent_sampling
    encoder_forced_variance: float = 0.0
    output_activation: str = DEFAULT_OUTPUT_ACTIVATION
    sigma: SigmaConfig = None
    representation: str = 'rgb'
    version: str = VERSION
    iws_mode: str = 'reference'             # 'reference' quirk | 'lme' correct
    compute_dtype: str = 'float32'          # 'float32' | 'bfloat16'

    def __post_init__(self):
        assert self.type in ('jvae', 'cvae', 'xvae', 'vib', 'vae')
        assert not (self.y_is_coded and self.type in ('vib', 'vae'))
        object.__setattr__(self, 'input_shape', tuple(self.input_shape))
        object.__setattr__(self, 'encoder', tuple(self.encoder))
        object.__setattr__(self, 'decoder', tuple(self.decoder))
        object.__setattr__(self, 'classifier', tuple(self.classifier))
        if self.sigma is None:
            object.__setattr__(self, 'sigma', SigmaConfig(value=1.0))
        prior = self.prior
        if prior is None:
            prior = PriorConfig(dim=self.latent_dim)
        if self.type in ('cvae', 'xvae') and prior.num_priors == 1:
            prior = dataclasses.replace(prior, num_priors=self.num_labels)
        if prior.dim != self.latent_dim:
            prior = dataclasses.replace(prior, dim=self.latent_dim)
        object.__setattr__(self, 'prior', prior)
        if not self.test_latent_sampling:
            object.__setattr__(self, 'test_latent_sampling', self.latent_sampling)
        if not self.x_is_generated:
            object.__setattr__(self, 'decoder', ())
            object.__setattr__(self, 'upsampler', None)
            object.__setattr__(self, 'output_distribution', None)
        if not self.y_is_decoded:
            object.__setattr__(self, 'classifier', ())
        assert not self.upsampler or self.features, 'no upsampler without features'

    # --- type flags (ref cvae.py:188-230) ---
    @property
    def is_jvae(self): return self.type == 'jvae'

    @property
    def is_vib(self): return self.type == 'vib'

    @property
    def is_vae(self): return self.type == 'vae'

    @property
    def is_cvae(self): return self.type == 'cvae'

    @property
    def is_xvae(self): return self.type == 'xvae'

    @property
    def y_is_decoded(self) -> bool:
        if self.is_cvae or self.is_vae:
            return bool(self.gamma)
        return True

    @property
    def x_is_generated(self) -> bool:
        return not self.is_vib

    @property
    def losses_per_class(self) -> bool:
        """ref losses_might_be_computed_for_each_class (cvae.py:205)."""
        return not self.is_vae and not self.is_vib

    @property
    def has_batch_norm(self) -> bool:
        """Any BN in the module tree — must agree with what setup()
        builds ('encoder'/'both' conv-stack BN, or resnet features), or the
        train step would index a batch_stats collection that does not
        exist."""
        return bool(self.features) and (
            self.batch_norm in ('encoder', 'both')
            or str(self.features).startswith(('resnet', 'densenet')))

    @property
    def classifier_type(self) -> Optional[str]:
        if not self.y_is_decoded:
            return None
        if (self.is_cvae and self.classifier
                and isinstance(self.classifier[0], str)):
            assert self.classifier[0] in ('softmax',)
            return self.classifier[0]
        return 'linear'

    @property
    def loss_components(self) -> Tuple[str, ...]:
        lc = LOSS_COMPONENTS_PER_TYPE[self.type]
        if self.y_is_decoded and 'cross_y' not in lc:
            lc = lc + ('cross_y',)
        return lc

    @property
    def predict_methods(self):
        m = list(PREDICT_METHODS_PER_TYPE[self.type])
        if self.y_is_decoded and 'esty' not in m:
            m.append('esty')
        return m

    @property
    def ood_methods(self):
        return list(OOD_METHODS_PER_TYPE[self.type])

    @property
    def misclass_methods(self):
        return list(MISCLASS_METHODS_PER_TYPE[self.type])

    @property
    def metrics(self):
        return list(METRICS_PER_TYPE[self.type])

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == 'bfloat16' else jnp.float32

    @property
    def sigma_cfg(self) -> SigmaConfig:
        return self.sigma

    @property
    def architecture(self) -> Dict[str, Any]:
        """params.json-compatible architecture dict (ref cvae.py:348-378)."""
        d = {'input_shape': list(self.input_shape),
             'num_labels': self.num_labels,
             'output_distribution': self.output_distribution,
             'type': self.type,
             'representation': self.representation,
             'encoder': list(self.encoder),
             'batch_norm': self.batch_norm,
             'dropout': self.dropout,
             'activation': self.activation,
             'encoder_forced_variance': self.encoder_forced_variance,
             'latent_dim': self.latent_dim,
             'test_latent_sampling': self.test_latent_sampling,
             'prior': self.prior.params,
             'decoder': list(self.decoder),
             'upsampler': self.upsampler,
             'classifier': list(self.classifier),
             'output_activation': self.output_activation,
             'y_is_coded': self.y_is_coded,
             'iws_mode': self.iws_mode,
             'compute_dtype': self.compute_dtype,
             'version': self.version}
        if self.features:
            d['features'] = self.features
        return d

    @property
    def depth(self) -> int:
        return (len(self.encoder) + len(self.decoder)
                + (len(self.classifier) if self.classifier_type == 'linear' else 0))

    @property
    def width(self) -> int:
        clf = [d for d in self.classifier if isinstance(d, int)]
        return (sum(self.encoder) + sum(self.decoder)
                + (sum(clf) if self.classifier_type == 'linear' else 0))

    @classmethod
    def from_dict(cls, d: Dict[str, Any], **overrides) -> 'CVNetConfig':
        """Build from a params.json-style architecture dict."""
        d = dict(d)
        d.pop('version', None)
        prior = d.pop('prior', None)
        if isinstance(prior, dict):
            p = dict(prior)
            dim = p.pop('dim', d.get('latent_dim', 32))
            dist = p.pop('distribution', 'gaussian')
            d['prior'] = build_prior_config(dim, dist, **p)
        sigma = d.pop('sigma', None)
        if isinstance(sigma, dict):
            # copy before mutating: the caller often passes the live
            # training_parameters['sigma'] dict (load_job), and popping
            # 'value_' from it would drop reference-schema data from the
            # next save
            sigma = dict(sigma)
            sigma.pop('value_', None)
            if sigma.get('input_dim'):
                sigma['input_dim'] = tuple(sigma['input_dim'])
            d['sigma'] = SigmaConfig(**{k: v for k, v in sigma.items()
                                        if k in {f.name for f in
                                                 dataclasses.fields(SigmaConfig)}})
        elif sigma is not None:
            d['sigma'] = SigmaConfig(value=sigma)
        if 'y_is_coded' not in d:
            # reference params.json carries only the type; y-coding is
            # derived in its ctor (ref cvae.py:188-230)
            d['y_is_coded'] = d.get('type') in ('jvae', 'xvae')
        d.update(overrides)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def decode_native_f(cfg: 'CVNetConfig') -> int:
    """Native-layout packing factor of the decode output (0 = unavailable).

    Mirrors the imager construction in ``CVNet.setup`` so scoring callers
    can decide statically whether ``decode(..., native=True)`` will return
    the packed-NHWC layout (and transform the target image to match) —
    the basis of the transpose-free loss path (see ConvStack.native_f)."""
    if not (cfg.x_is_generated and cfg.upsampler):
        return 0
    hw = find_input_shape(cfg.upsampler, cfg.input_shape[1:])
    imager_input_dim = cfg.decoder[-1] if cfg.decoder else cfg.latent_dim
    f = hw[0] * hw[1]
    if imager_input_dim % f:
        return 0
    imager_in = (imager_input_dim // f, *hw)
    _, plans, _ = conv_stack_plan(
        imager_in, cfg.upsampler, where='output',
        batch_norm=cfg.batch_norm == 'both' and bool(cfg.features),
        activation=cfg.activation,
        output_activation=cfg.output_activation,
        output_distribution=cfg.output_distribution)
    return ConvStack(input_shape=imager_in, plans=plans, where='output',
                     output_distribution=cfg.output_distribution).native_f()


class CVNet(nn.Module):
    """Flax module; see module docstring.  Methods are designed to be called
    individually via ``apply(..., method=...)`` so the evaluation engine can
    run features once and fan out over the class axis."""
    cfg: CVNetConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.dtype
        bn_encoder = cfg.batch_norm in ('encoder', 'both') and bool(cfg.features)
        bn_decoder = cfg.batch_norm == 'both' and bool(cfg.features)

        if cfg.features and cfg.features.startswith(('resnet', 'densenet')):
            from .resnet import ResNetFeatures, DenseNetFeatures
            # optional width suffix: 'resnet18:16' (base width),
            # 'densenet121:12' (growth rate)
            arch, _, width = cfg.features.partition(':')
            if arch.startswith('resnet'):
                kw = {'width': int(width)} if width else {}
                self.features_stack = ResNetFeatures(arch=arch, dtype=dtype,
                                                     **kw)
            else:
                kw = {'growth': int(width)} if width else {}
                self.features_stack = DenseNetFeatures(
                    arch=arch, dtype=dtype,
                    input_hw=tuple(cfg.input_shape[-2:]), **kw)
            self.features_name = cfg.features
            out_shape = self.features_stack.output_shape
            self.features_output_shape = out_shape
            encoder_input_shape = out_shape
        elif cfg.features:
            name, plans, out_shape = conv_stack_plan(
                cfg.input_shape, cfg.features, where='input',
                batch_norm=bn_encoder, activation=cfg.activation)
            self.features_name = name
            self.features_output_shape = out_shape
            self.features_stack = ConvStack(
                input_shape=cfg.input_shape, plans=plans, where='input', dtype=dtype)
            encoder_input_shape = out_shape
        else:
            self.features_name = None
            self.features_output_shape = None
            self.features_stack = None
            encoder_input_shape = cfg.input_shape
        self.encoder_input_shape = encoder_input_shape
        self.encoder_input_dim = int(np.prod(encoder_input_shape))

        sigma_head = (int(np.prod(cfg.sigma_cfg.output_dim))
                      if cfg.sigma_cfg.coded else 0)
        self.encoder = Encoder(
            latent_dim=cfg.latent_dim, num_labels=cfg.num_labels,
            intermediate_dims=cfg.encoder, y_is_coded=cfg.y_is_coded,
            dropout=cfg.dropout, activation=cfg.activation,
            sigma_output_dim=sigma_head,
            forced_variance=cfg.encoder_forced_variance, dtype=dtype)

        if cfg.x_is_generated:
            self.decoder = MLP(cfg.decoder, cfg.activation, cfg.dropout, dtype,
                               name='decoder')
            imager_input_dim = cfg.decoder[-1] if cfg.decoder else cfg.latent_dim
            if cfg.upsampler:
                hw = find_input_shape(cfg.upsampler, cfg.input_shape[1:])
                f = hw[0] * hw[1]
                assert imager_input_dim % f == 0, \
                    'Could not go from {} to *, {} {}'.format(imager_input_dim, *hw)
                imager_in = (imager_input_dim // f, *hw)
                _, plans, _ = conv_stack_plan(
                    imager_in, cfg.upsampler, where='output',
                    batch_norm=bn_decoder, activation=cfg.activation,
                    output_activation=cfg.output_activation,
                    output_distribution=cfg.output_distribution)
                self.imager_input_shape = imager_in
                self.imager = ConvStack(input_shape=imager_in, plans=plans,
                                        where='output',
                                        output_distribution=cfg.output_distribution,
                                        dtype=dtype)
            else:
                self.imager_input_shape = (imager_input_dim,)
                f = 1 if cfg.output_distribution == 'gaussian' else 256
                self.imager = _DenseImager(
                    out_shape=cfg.input_shape, factor=f,
                    output_activation=cfg.output_activation, dtype=dtype,
                    name='imager')
        else:
            self.decoder = None
            self.imager = None

        if cfg.classifier_type == 'linear' or cfg.classifier_type is None:
            clf = tuple(d for d in cfg.classifier if isinstance(d, int))
            self.classifier = Classifier(cfg.num_labels, clf, cfg.activation,
                                         dtype=dtype)
        else:
            self.classifier = None

        self.prior = PriorParams(cfg.prior)

        # learned (non-coded) sigma: a trainable log-sigma vector
        # (ref Sigma with learned=True, module/vae_layers/layers.py:73-114)
        if cfg.sigma_cfg.learned and not cfg.sigma_cfg.coded:
            v0 = float(np.log(cfg.sigma_cfg.value)) if cfg.sigma_cfg.value > 0 else -30.0
            self.sigma_param = self.param(
                'sigma_param',
                lambda key: jnp.full((cfg.sigma_cfg.sdim,), v0, jnp.float32))

    # ------ sub-applies ------

    def features(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.cfg.representation == 'hsv' and x.shape[-3] == 3:
            from .representation import rgb2hsv
            x = rgb2hsv(x)
        if self.features_stack is None:
            return x
        return self.features_stack(x, train)

    def encode(self, t: jax.Array, y_onehot: Optional[jax.Array] = None,
               train: bool = False):
        """t: (..., *encoder_input_shape) -> (mu, log_var, sigma_coded)."""
        flat = t.reshape(t.shape[:t.ndim - len(self.encoder_input_shape)] + (-1,))
        return self.encoder(flat, y_onehot, train)

    def decode(self, z: jax.Array, train: bool = False,
               native: bool = False,
               bn_train: Optional[bool] = None) -> jax.Array:
        """z: (..., K) -> reconstruction (..., [256,] *input_shape).

        ``native=True`` (only honored by a ConvStack imager whose
        ``native_f() > 0``) returns the stack's native NHWC/packed layout —
        see ``decode_native_f`` and ConvStack.native_f.  ``bn_train``
        overrides ``train`` for the conv imager only (WIM fine-tuning
        freezes BatchNorm but keeps MLP dropout live, ref ft/job.py:98-111)."""
        u = self.decoder(z, train)
        lead = u.shape[:-1]
        conv_train = train if bn_train is None else bn_train
        out = self.imager(u.reshape((-1,) + tuple(self.imager_input_shape)),
                          conv_train, native_out=native) \
            if isinstance(self.imager, ConvStack) else self.imager(u)
        return out.reshape(lead + out.shape[1:]) \
            if isinstance(self.imager, ConvStack) else out

    def classify(self, z: jax.Array) -> jax.Array:
        if self.cfg.classifier_type == 'softmax':
            # gaussian-dictionary classifier (ref cvae.py:499, bias sign kept)
            m = self.prior()['mean']
            return (jnp.einsum('...k,ck->...c', z, m)
                    + 0.5 * jnp.sum(jnp.square(m), axis=-1))
        return self.classifier(z)

    def prior_params(self):
        return self.prior()

    def __call__(self, x: jax.Array, y: Optional[jax.Array] = None,
                 train: bool = False, sampling: bool = True):
        """Convenience full forward (compile-check path).

        Returns (x_reco, logits, mu, log_var, z) with the (L+1) sample axis
        leading (ref forward, cvae.py:426-521)."""
        from ..ops.sampling import reparameterize
        cfg = self.cfg
        if y is None and cfg.y_is_coded:
            raise ValueError('y is supposed to be an input of the net')
        self.prior()  # materialize prior params at init time
        t = self.features(x, train)
        y_onehot = None
        if y is not None and cfg.y_is_coded:
            y_onehot = onehot_encoding(y, cfg.num_labels, cfg.dtype)
        mu, log_var, _ = self.encode(t, y_onehot, train)
        L = cfg.latent_sampling if train else cfg.test_latent_sampling
        key = self.make_rng('sampling')
        dist = 'uniform' if cfg.prior.distribution == 'uniform' else 'gaussian'
        z, _ = reparameterize(key, mu, log_var, L, dist,
                              is_sampled=sampling and (cfg.latent_sampling > 1
                                                       or cfg.beta > 0))
        x_reco = self.decode(z, train) if cfg.x_is_generated else x
        logits = self.classify(z)
        return x_reco, logits, mu, log_var, z


class _DenseImager(nn.Module):
    """Linear imager when there is no deconv upsampler (ref cvae.py:319-326)."""
    out_shape: Tuple[int, ...]
    factor: int = 1
    output_activation: str = 'sigmoid'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        d = self.factor * int(np.prod(self.out_shape))
        x = nn.Dense(d, dtype=self.dtype, name='dense')(u)
        x = ACTIVATIONS[self.output_activation](x)
        lead = x.shape[:-1]
        if self.factor == 256:
            return x.reshape(lead + (256,) + tuple(self.out_shape))
        return x.reshape(lead + tuple(self.out_shape))
