"""Quality curve for the --positions-per-step sampling dial, at scale.

The reference reverse process resamples exactly ONE position per forward
(antibody_scripts/sample.py:499-513); `--positions-per-step k` trades that
exactness for ~k x fewer forwards by sampling k positions independently
within a step. This script measures what that approximation costs:

1. trains the tiny-config HuDiff-Ab on the HuAb348 experimentally-humanized
   pairs (real human framework statistics, small enough to train in minutes);
2. humanizes a fixed subset of the HuAb348 mouse pairs at k in {1,2,4,8},
   with >=3 independent sampling seeds per k (round-3 VERDICT next #4:
   n=8/1-seed cannot support a quality claim; defaults here are 64 mice x
   3 seeds, packed into shared device programs);
3. reports mean +/- 95% CI (t-dist over seeds) for preservation and
   germline FR identity per k, plus the seed-paired drift vs k=1 with its
   own CI.

Run: PYTHONPATH=/root/repo[:/root/.axon_site] python tools/pps_quality.py
     [--train-steps 300] [--n-mice 64] [--seeds 2023,2024,2025]
     [--rows-per-mouse 16] [--device-batch 128]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HUAB348 = ('/root/reference/data/antibody_eval_data/HuAb348_data/'
           'humanization_pair_data_filter.csv')

# two-sided 97.5% t quantiles for small seed counts (df = n-1)
_T975 = {1: float('nan'), 2: 12.706, 3: 4.303, 4: 3.182, 5: 2.776,
         6: 2.571, 7: 2.447, 8: 2.365, 9: 2.306, 10: 2.262}


def mean_ci(vals):
    """(mean, 95% CI half-width) over independent seed-level values.
    For >10 seeds the df=9 quantile (2.262) is kept as a conservative cap
    rather than dropping to the anti-conservative z=1.96."""
    v = np.asarray(vals, np.float64)
    n = len(v)
    m = float(v.mean())
    if n < 2:
        return m, float('nan')
    hw = _T975.get(n, _T975[10]) * float(v.std(ddof=1)) / np.sqrt(n)
    return m, float(hw)


def train_tiny(train_steps: int):
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
    from hudiff_tpu.sampling import humanize as H
    from hudiff_tpu.training import schedules
    from hudiff_tpu.training import train_step as T
    from hudiff_tpu.utils.config import Namespace

    ref = pd.read_csv(HUAB348)
    human = ref[ref['type'] == 'humanized'].reset_index(drop=True)
    grids, chains = [], []
    for _, r in human.iterrows():
        inp = H.pair_input(r['h_seq'], r['l_seq'])
        if inp is None:
            continue
        grids.append(inp['clean'])
        chains.append(inp['chain'])
    tokens_all = np.stack(grids)
    chains_all = np.stack(chains)
    print(f'training pairs: {len(tokens_all)}', file=sys.stderr)

    cfg = DenoiserConfig().test_size()
    model = AntiTFNet(cfg)
    region = jnp.asarray(T.pair_region_batch(1))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, C.PAIR_LEN), jnp.int32), region,
                        jnp.asarray([[0, 2]]))
    tx = schedules.make_optimizer(Namespace({'type': 'Adam', 'lr': 3e-4}),
                                  clip_norm=10.0)
    state = T.TrainState.create(params, tx)
    step = T.make_pair_train_step(model)

    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(1)
    B = 32
    for i in range(train_steps):
        ix = rs.randint(0, len(tokens_all), B)
        state, m = step(state, jnp.asarray(tokens_all[ix]),
                        jnp.asarray(chains_all[ix]), rng)
        if (i + 1) % 100 == 0:
            print(f'step {i+1}: loss {float(m["loss"]):.4f}',
                  file=sys.stderr)
    return model, state.params


def load_mice(n_mice: int):
    import pandas as pd

    from hudiff_tpu.sampling import humanize as H

    ref = pd.read_csv(HUAB348)
    mouse = ref[ref['type'] == 'mouse'].reset_index(drop=True)
    mice = []
    for _, r in mouse.iterrows():
        inp = H.pair_input(r['h_seq'], r['l_seq'])
        if inp is not None:
            mice.append((str(r['name']), inp))
        if len(mice) == n_mice:
            break
    return mice


def eval_one_setting(hum, mice, seed: int, rows_per_mouse: int):
    """Humanize every mouse (best-of-rows_per_mouse) on a shared per-k
    humanizer (re-seeded per call, so seeds reuse the compiled sampler);
    return per-metric means over mice."""
    import jax

    from hudiff_tpu import constants as C
    from hudiff_tpu.numbering import germline as G

    hum.rng = jax.random.PRNGKey(seed)
    results = hum.humanize_many([inp for _, inp in mice],
                                rows_per_input=rows_per_mouse)
    prot = np.concatenate([C.HEAVY_CDR_INDEX, C.LIGHT_CDR_INDEX]) != 0
    pres_h, pres_l, germ_h, germ_l, cdr_ok = [], [], [], [], []
    for (name, inp), res in zip(mice, results):
        best = res['grids'][res['best_idx']]
        par = inp['clean']
        cdr_ok.append(bool((best[prot] == par[prot]).all()))
        pres_h.append(float((best[:C.HEAVY_LEN] == par[:C.HEAVY_LEN]).mean()))
        pres_l.append(float((best[C.HEAVY_LEN:] == par[C.HEAVY_LEN:]).mean()))
        bh, bl = res['best']
        try:
            germ_h.append(G.germline_fr_identity(bh, 'H'))
            germ_l.append(G.germline_fr_identity(bl))
        except ValueError:
            pass
    return {'preservation_h': float(np.mean(pres_h)),
            'preservation_l': float(np.mean(pres_l)),
            'germline_fr_h': float(np.mean(germ_h)),
            'germline_fr_l': float(np.mean(germ_l)),
            'cdr_invariant': all(cdr_ok)}


METRICS = ('preservation_h', 'preservation_l', 'germline_fr_h',
           'germline_fr_l')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--train-steps', type=int, default=300)
    p.add_argument('--n-mice', type=int, default=64)
    p.add_argument('--seeds', default='2023,2024,2025')
    p.add_argument('--rows-per-mouse', type=int, default=16)
    p.add_argument('--device-batch', type=int, default=128)
    p.add_argument('--ks', default='1,2,4,8')
    args = p.parse_args()

    from hudiff_tpu.sampling import humanize as H
    from hudiff_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model, params = train_tiny(args.train_steps)
    mice = load_mice(args.n_mice)
    print(f'mice: {len(mice)}', file=sys.stderr)

    ks = [int(k) for k in args.ks.split(',')]
    seeds = [int(s) for s in args.seeds.split(',')]
    # per_seed[k][seed] -> metric dict
    per_seed = {k: {} for k in ks}
    for k in ks:
        # ONE humanizer (= one jitted sampler) per k; seeds re-seed its rng
        # instead of rebuilding + recompiling it per (k, seed)
        hum = H.PairHumanizer(model, params, batch_size=args.rows_per_mouse,
                              device_batch=args.device_batch,
                              positions_per_step=k)
        for seed in seeds:
            per_seed[k][seed] = eval_one_setting(hum, mice, seed,
                                                 args.rows_per_mouse)
            print(f'k={k} seed={seed}: '
                  + ' '.join(f'{m}={per_seed[k][seed][m]:.4f}'
                             for m in METRICS), file=sys.stderr)

    table = {}
    for k in ks:
        row = {}
        for m in METRICS:
            mean, hw = mean_ci([per_seed[k][s][m] for s in seeds])
            row[m] = {'mean': round(mean, 4), 'ci95': round(hw, 4)}
        row['cdr_invariant'] = all(per_seed[k][s]['cdr_invariant']
                                   for s in seeds)
        # seed-paired drift vs k=1 (each seed's k-run minus its own k=1 run
        # cancels the seed-level sampling noise)
        if k != ks[0]:
            for m in ('preservation_h', 'germline_fr_h'):
                d = [per_seed[k][s][m] - per_seed[ks[0]][s][m]
                     for s in seeds]
                mean, hw = mean_ci(d)
                row[f'd_{m}_vs_k1'] = {'mean': round(mean, 4),
                                       'ci95': round(hw, 4)}
        table[k] = row

    print(json.dumps({'n_mice': len(mice), 'seeds': seeds,
                      'rows_per_mouse': args.rows_per_mouse,
                      'train_steps': args.train_steps,
                      'per_k': table}, indent=2))


if __name__ == '__main__':
    main()
