"""Quality curve for the --positions-per-step sampling dial.

The reference reverse process resamples exactly ONE position per forward
(antibody_scripts/sample.py:499-513); `--positions-per-step k` trades that
exactness for ~k x fewer forwards by sampling k positions independently
within a step. This script measures what that approximation costs:

1. trains the tiny-config HuDiff-Ab on the HuAb348 experimentally-humanized
   pairs (real human framework statistics, small enough to train in minutes);
2. humanizes a fixed subset of the HuAb348 mouse pairs at k in {1,2,4,8}
   with fixed seeds;
3. reports preservation (vs mouse) and germline FR identity per k, plus the
   drift vs k=1.

Run: PYTHONPATH=/root/repo[:/root/.axon_site] python tools/pps_quality.py
     [--train-steps 300] [--n-mice 8] [--batch 16]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--train-steps', type=int, default=300)
    p.add_argument('--n-mice', type=int, default=8)
    p.add_argument('--batch', type=int, default=16)
    p.add_argument('--ks', default='1,2,4,8')
    args = p.parse_args()

    import pandas as pd

    import jax
    import jax.numpy as jnp

    from hudiff_tpu import constants as C
    from hudiff_tpu.models.denoiser import AntiTFNet, DenoiserConfig
    from hudiff_tpu.numbering import germline as G
    from hudiff_tpu.sampling import humanize as H
    from hudiff_tpu.sampling import sampler as S
    from hudiff_tpu.training import schedules
    from hudiff_tpu.training import train_step as T
    from hudiff_tpu.utils.config import Namespace

    ref = pd.read_csv(HUAB348)
    human = ref[ref['type'] == 'humanized'].reset_index(drop=True)
    mouse = ref[ref['type'] == 'mouse'].reset_index(drop=True)

    # --- 1. training set: gridded experimentally-humanized pairs ---
    tok = H._TOK
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
    for i in range(args.train_steps):
        ix = rs.randint(0, len(tokens_all), B)
        state, m = step(state, jnp.asarray(tokens_all[ix]),
                        jnp.asarray(chains_all[ix]), rng)
        if (i + 1) % 100 == 0:
            print(f'step {i+1}: loss {float(m["loss"]):.4f}',
                  file=sys.stderr)
    params = state.params

    # --- 2. fixed mouse subset, humanize at each k with the SAME seed ---
    mice = []
    for _, r in mouse.iterrows():
        inp = H.pair_input(r['h_seq'], r['l_seq'])
        if inp is not None:
            mice.append((str(r['name']), r['h_seq'], r['l_seq'], inp))
        if len(mice) == args.n_mice:
            break

    ks = [int(k) for k in args.ks.split(',')]
    table = {}
    for k in ks:
        hum = H.PairHumanizer(model, params, batch_size=args.batch,
                              seed=2023, positions_per_step=k)
        pres_h, pres_l, germ_h, germ_l, cdr_ok = [], [], [], [], []
        for name, h_seq, l_seq, inp in mice:
            res = hum(h_seq, l_seq)
            best = res['grids'][res['best_idx']]
            par = inp['clean']
            # protected (CDR) slots must be untouched at every k
            prot = np.concatenate([C.HEAVY_CDR_INDEX,
                                   C.LIGHT_CDR_INDEX]) != 0
            cdr_ok.append(bool((best[prot] == par[prot]).all()))
            ph = float((best[:C.HEAVY_LEN] == par[:C.HEAVY_LEN]).mean())
            pl = float((best[C.HEAVY_LEN:] == par[C.HEAVY_LEN:]).mean())
            pres_h.append(ph)
            pres_l.append(pl)
            try:
                bh = tok.idx2seq(best[:C.HEAVY_LEN])
                bl = tok.idx2seq(best[C.HEAVY_LEN:])
                germ_h.append(G.germline_fr_identity(bh, 'H'))
                germ_l.append(G.germline_fr_identity(bl))
            except ValueError:
                pass
        table[k] = {
            'preservation_h': round(float(np.mean(pres_h)), 4),
            'preservation_l': round(float(np.mean(pres_l)), 4),
            'germline_fr_h': round(float(np.mean(germ_h)), 4),
            'germline_fr_l': round(float(np.mean(germ_l)), 4),
            'cdr_invariant': all(cdr_ok),
        }

    base = table[ks[0]]
    for k in ks:
        table[k]['d_pres_h_vs_k1'] = round(
            table[k]['preservation_h'] - base['preservation_h'], 4)
        table[k]['d_germ_h_vs_k1'] = round(
            table[k]['germline_fr_h'] - base['germline_fr_h'], 4)
    print(json.dumps({'n_mice': len(mice),
                      'train_steps': args.train_steps,
                      'per_k': table}, indent=2))


if __name__ == '__main__':
    main()
