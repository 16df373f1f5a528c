"""fast_init + params-handling contracts.

Round-3 perf work established two rules for tunneled backends
(docs/perf.md "Compile time" / "Eager dispatch" sections):

1. model init must run as ONE jitted program off-CPU (eager flax init pays
   a round trip per op — measured 275 s vs 9 s for the flagship);
2. jitted samplers must take params as ARGUMENTS (closure captures embed as
   HLO constants) and must device-commit host numpy trees once (numpy jit
   arguments re-upload per call).

These tests pin the pieces that are checkable on CPU: jit-init numerics
match eager init, numpy checkpoint-style trees are accepted and committed,
and the eager-on-CPU fast path is taken (so the suite never pays extra
per-config init compiles).
"""
import jax
import jax.numpy as jnp
import numpy as np

from hudiff_tpu import constants as C
from hudiff_tpu.models.denoiser import NanoAntiTFNet, nano_config
from hudiff_tpu.sampling import sampler as S
from hudiff_tpu.utils.fast_init import fast_init


def _tiny():
    cfg = nano_config().test_size()
    model = NanoAntiTFNet(cfg)
    tokens = jnp.zeros((1, C.HEAVY_LEN), jnp.int32)
    region = jnp.broadcast_to(jnp.asarray(C.HEAVY_REGION_INDEX),
                              (1, C.HEAVY_LEN))
    return model, tokens, region


def test_jit_init_matches_eager_init():
    """jax.jit(model.init) must produce bit-identical parameters to eager
    init — the substitution fast_init performs off-CPU is only sound if the
    traced init graph reproduces eager numerics exactly."""
    model, tokens, region = _tiny()
    rng = jax.random.PRNGKey(7)
    eager = model.init(rng, tokens, region)
    jitted = jax.jit(model.init)(rng, tokens, region)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        eager, jitted)


def test_fast_init_eager_on_cpu(monkeypatch):
    """On a CPU default backend fast_init must NOT jit (each per-config init
    compile would slow the whole suite); off-CPU it must."""
    model, tokens, region = _tiny()
    calls = {}
    real_jit = jax.jit

    def spy_jit(fn, *a, **kw):
        calls['jit'] = True
        return real_jit(fn, *a, **kw)

    monkeypatch.setattr(jax, 'jit', spy_jit)
    assert jax.default_backend() == 'cpu'  # conftest pins the suite to CPU
    out = fast_init(model, jax.random.PRNGKey(0), tokens, region)
    assert 'jit' not in calls
    assert jax.tree_util.tree_leaves(out)  # real variables came back


def test_make_jit_sampler_accepts_numpy_params():
    """Checkpoint loaders hand back host numpy trees; make_jit_sampler must
    commit them to a device once and sample identically to device params."""
    model, tokens, region = _tiny()
    params = model.init(jax.random.PRNGKey(0), tokens, region)
    np_params = jax.tree_util.tree_map(np.asarray, params)

    B = 2
    cdr = np.asarray(C.HEAVY_CDR_INDEX)
    fr = np.nonzero(cdr == 0)[0]
    grid = np.random.RandomState(3).randint(0, C.N_AA, (B, C.HEAVY_LEN))
    grid[:, fr] = C.IDX_MSK
    grid = jnp.asarray(grid, jnp.int32)
    region_b = jnp.broadcast_to(region[0], (B, C.HEAVY_LEN))
    order = S.build_order(fr, B, rng=jax.random.PRNGKey(1))

    run_np = S.make_jit_sampler(model, np_params, has_chain_type=False)
    run_dev = S.make_jit_sampler(model, params, has_chain_type=False)
    out_np = np.asarray(run_np(grid, region_b, order, jax.random.PRNGKey(2)))
    out_dev = np.asarray(run_dev(grid, region_b, order, jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(out_np, out_dev)
    assert (out_np != C.IDX_MSK).all()


def test_sequential_sampler_accepts_numpy_params():
    model, tokens, region = _tiny()
    params = model.init(jax.random.PRNGKey(0), tokens, region)
    np_params = jax.tree_util.tree_map(np.asarray, params)
    cdr = np.asarray(C.HEAVY_CDR_INDEX)
    fr = np.nonzero(cdr == 0)[0][:6]
    grid = np.random.RandomState(5).randint(0, C.N_AA, (1, C.HEAVY_LEN))
    grid[:, fr] = C.IDX_MSK
    grid = jnp.asarray(grid, jnp.int32)
    order = S.build_order(fr, 1, shuffle=False)
    run = S.sequential_reference_sampler(model, np_params,
                                         has_chain_type=False)
    out = np.asarray(run(grid, region, order, jax.random.PRNGKey(4)))
    assert (out[:, fr] != C.IDX_MSK).all()
