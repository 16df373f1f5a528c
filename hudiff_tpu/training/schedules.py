"""Learning-rate schedules matching the reference's semantics.

- WarmupPolyLR (utils/train_utils.py:16-34): linear warmup from base lr to
  max_lr, then polynomial decay back toward base lr, floored at min_lr.
- ReduceLROnPlateau (torch semantics as used at antibody_train.py:433): decay
  lr by ``factor`` after ``patience`` validations without improvement —
  host-side state driving an optax ``inject_hyperparams`` learning rate.
- GradualWarmup (utils/warmup.py:28-88): linear multiplier ramp over
  ``total_epoch`` validations, then hand off to plateau.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import optax


def warmup_poly_schedule(base_lr: float, max_lr: float, min_lr: float,
                         warmup_iters: int, max_iters: int,
                         power: int = 2) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr + (max_lr - base_lr) * (step / max(warmup_iters, 1))
        frac = (step - warmup_iters) / max(max_iters - warmup_iters, 1)
        decay = (1.0 - jnp.clip(frac, 0.0, 1.0)) ** power
        decayed = max_lr * decay + (1.0 - decay) * base_lr
        decayed = jnp.maximum(decayed, min_lr)
        return jnp.where(step < warmup_iters, warm, decayed)

    return schedule


@dataclasses.dataclass
class ReduceOnPlateau:
    """Host-side plateau scheduler: call ``update(val_loss)`` after each
    validation; read ``lr`` for the next steps."""
    init_lr: float
    factor: float = 0.6
    patience: int = 10
    min_lr: float = 1e-6
    # GradualWarmup handoff (multiplier/total_epoch in the reference configs)
    warmup_multiplier: float = 1.0
    warmup_epochs: int = 0

    def __post_init__(self):
        self.lr = (self.init_lr if self.warmup_epochs == 0 else
                   self.init_lr)  # ramp applied in update()
        self.best: Optional[float] = None
        self.bad = 0
        self.epoch = 0

    def update(self, val_loss: float) -> float:
        self.epoch += 1
        if self.epoch <= self.warmup_epochs:
            ramp = 1.0 + (self.warmup_multiplier - 1.0) * self.epoch / self.warmup_epochs
            self.lr = self.init_lr * ramp
            return self.lr
        if self.best is None or val_loss < self.best:
            self.best = val_loss
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad = 0
        return self.lr

    # host-scheduler state persists inside checkpoint metadata so resume
    # continues at the same LR/patience (the reference saves the torch
    # scheduler object, antibody_train.py:438-445)
    def state_dict(self) -> dict:
        return {'lr': self.lr, 'best': self.best, 'bad': self.bad,
                'epoch': self.epoch}

    def load_state_dict(self, state: dict) -> None:
        self.lr = float(state['lr'])
        self.best = None if state.get('best') is None else float(state['best'])
        self.bad = int(state.get('bad', 0))
        self.epoch = int(state.get('epoch', 0))


@dataclasses.dataclass
class CosineAnnealing:
    """Host-side cosine annealing (reference scheduler_selected 'cosine' =
    torch CosineAnnealingLR, utils/train_utils.py:75-97): lr follows
    ``eta_min + (init - eta_min) * (1 + cos(pi * t / T_max)) / 2`` per
    validation step. Same ``update(val_loss) -> lr`` protocol as
    ReduceOnPlateau (the val loss is ignored)."""
    init_lr: float
    t_max: int = 100
    eta_min: float = 0.0

    def __post_init__(self):
        self.lr = self.init_lr
        self.epoch = 0

    def update(self, val_loss: float) -> float:
        import math
        self.epoch += 1
        t = min(self.epoch, self.t_max)
        self.lr = self.eta_min + (self.init_lr - self.eta_min) * \
            (1.0 + math.cos(math.pi * t / self.t_max)) / 2.0
        return self.lr

    def state_dict(self) -> dict:
        return {'lr': self.lr, 'epoch': self.epoch}

    def load_state_dict(self, state: dict) -> None:
        self.lr = float(state['lr'])
        self.epoch = int(state.get('epoch', 0))


def make_host_scheduler(sched_cfg, init_lr: float):
    """Factory over the host-side schedulers (reference scheduler_selected):
    'plateau' (default) or 'cosine'. Both expose ``update(val_loss) -> lr``."""
    # config objects are Namespace (a dict subclass, utils/config.py)
    kind = sched_cfg.get('type', 'plateau')
    get = sched_cfg.get
    if kind == 'cosine':
        return CosineAnnealing(init_lr=init_lr,
                               t_max=int(get('T_max', get('t_max', 100))),
                               eta_min=float(get('eta_min', 0.0)))
    if kind in ('plateau', 'warmup_plateau'):
        return ReduceOnPlateau(
            init_lr=init_lr,
            factor=get('factor', 0.6),
            patience=get('patience', 10),
            min_lr=get('min_lr', 1e-6),
            warmup_multiplier=get('multiplier', 1.0),
            warmup_epochs=get('total_epoch', 0))
    raise ValueError(f'unknown scheduler: {kind}')


def make_optimizer(opt_cfg, clip_norm: Optional[float] = None
                   ) -> optax.GradientTransformation:
    """Adam/AdamW with injected (host-mutable) learning rate
    (reference optimizer_selected, utils/train_utils.py:58-72)."""
    kind = getattr(opt_cfg, 'type', 'Adam')
    kwargs = dict(
        learning_rate=opt_cfg.lr,
        b1=getattr(opt_cfg, 'beta1', 0.9),
        b2=getattr(opt_cfg, 'beta2', 0.999),
    )
    if kind == 'Adam':
        # torch Adam applies weight decay as L2 into the gradient
        inner = optax.inject_hyperparams(optax.adamw)(
            weight_decay=0.0, **kwargs) if not getattr(opt_cfg, 'weight_decay', 0.) \
            else optax.inject_hyperparams(_adam_l2)(
                weight_decay=opt_cfg.weight_decay, **kwargs)
    elif kind == 'AdamW':
        inner = optax.inject_hyperparams(optax.adamw)(
            weight_decay=getattr(opt_cfg, 'weight_decay', 0.0), **kwargs)
    else:
        raise ValueError(f'unknown optimizer: {kind}')
    if clip_norm:
        return optax.chain(optax.clip_by_global_norm(clip_norm), inner)
    return inner


def _adam_l2(learning_rate, b1, b2, weight_decay):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(learning_rate, b1=b1, b2=b2),
    )


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning rate inside a (possibly chained) optax
    state (used by the host-side plateau scheduler)."""
    import jax.numpy as jnp

    def visit(state):
        if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
            state.hyperparams['learning_rate'] = jnp.asarray(
                lr, dtype=state.hyperparams['learning_rate'].dtype)
            return True
        if isinstance(state, tuple):
            return any(visit(s) for s in state)
        return False

    if not visit(opt_state):
        raise ValueError('no injected learning_rate found in optimizer state')
    return opt_state


def get_learning_rate(opt_state) -> Optional[float]:
    def visit(state):
        if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
            return float(state.hyperparams['learning_rate'])
        if isinstance(state, tuple):
            for s in state:
                v = visit(s)
                if v is not None:
                    return v
        return None

    return visit(opt_state)
