"""Humanization serving: a long-lived HTTP service around warm compiled
samplers.

The reference has no serving story — every humanization pays Python startup,
checkpoint load, and (here) XLA compilation. This module keeps the denoiser
parameters resident on device and the jitted reverse-process programs warm,
so a request costs only its device round:

    python -m hudiff_tpu.serving --ab-ckpt <ckpt> [--nano-ckpt <ckpt>] \
        [--port 8000] [--batch-size 16] [--positions-per-step 1]

API (JSON over HTTP, stdlib http.server — no extra dependencies):
  GET  /health            -> {"status": "ok", "models": [...], "device": ...}
  POST /humanize/ab       {"h_seq": .., "l_seq": .., "sample_number"?: n,
                           "method"?: "FR"|"inpaint"}
  POST /humanize/nano     {"vhh_seq": .., ...}
  POST /graft             {"h_seq": .., "l_seq": .., "back_mutation"?: bool}

A process-wide lock serializes device access (one chip, one program at a
time); the ThreadingHTTPServer keeps request parsing concurrent. Sampling
state (the PRNG stream) advances per request.
"""
from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional


class HumanizationService:
    """Holds warm humanizers + the device lock. Usable without HTTP too."""

    def __init__(self, ab_ckpt: Optional[str] = None,
                 nano_ckpt: Optional[str] = None, batch_size: int = 16,
                 positions_per_step: int = 1, seed: int = 2023,
                 use_bf16: bool = True, warmup: bool = True):
        from .sampling import humanize as H
        self._lock = threading.Lock()
        self.ab = self.nano = None
        self.ab_finetuned = self.nano_finetuned = False
        if ab_ckpt:
            model, variables, finetuned = H.load_denoiser(
                ab_ckpt, 'pair', use_bf16=use_bf16)
            self.ab = H.PairHumanizer(
                model, variables, batch_size=batch_size, seed=seed,
                positions_per_step=positions_per_step)
            self.ab_finetuned = finetuned
        if nano_ckpt:
            model, variables, finetuned = H.load_denoiser(
                nano_ckpt, 'heavy', use_bf16=use_bf16)
            self.nano = H.NanoHumanizer(
                model, variables, batch_size=batch_size, seed=seed,
                positions_per_step=positions_per_step)
            self.nano_finetuned = finetuned
        if warmup:
            self.warmup()

    def warmup(self) -> None:
        """Trigger compilation before serving traffic (first compile is tens
        of seconds; a warm request is the device round only)."""
        h = ('EVQLVESGGGLVQPGGSLRLSCAASGFTFSSYAMSWVRQAPGKGLEWVSAISGSGGSTYY'
             'ADSVKGRFTISRDNSKNTLYLQMNSLRAEDTAVYYCAKDRGYYFDYWGQGTLVTVSS')
        l = ('DIQMTQSPSSLSASVGDRVTITCRASQSISSYLNWYQQKPGKAPKLLIYAASSLQSGVPS'
             'RFSGSGSGTDFTLTISSLQPEDFATYYCQQSYSTPLTFGGGTKVEIK')
        with self._lock:
            if self.ab is not None:
                self.ab(h, l, finetune=self.ab_finetuned)
            if self.nano is not None:
                self.nano(h, finetune=self.nano_finetuned)

    def humanize_ab(self, h_seq: str, l_seq: str, sample_number: int = 1,
                    method: str = 'FR', max_retry: int = 8) -> Dict:
        if self.ab is None:
            raise ValueError('no antibody checkpoint loaded')
        from .sampling.humanize import collect_unique

        def round_fn():
            res = self.ab(h_seq, l_seq, finetune=self.ab_finetuned,
                          inpaint=method == 'inpaint')
            if res is None:
                return None
            return (list(zip(res['h_seqs'], res['l_seqs']))
                    if sample_number > 1 else [res['best']])

        with self._lock:
            unique, failed = collect_unique(round_fn, sample_number,
                                            max_retry)
        if failed and not unique:
            raise ValueError('chains did not align to the IMGT grid')
        return {'candidates': [{'h_seq': h, 'l_seq': l} for h, l in unique]}

    def humanize_nano(self, vhh_seq: str, sample_number: int = 1,
                      method: str = 'FR', max_retry: int = 8) -> Dict:
        if self.nano is None:
            raise ValueError('no nanobody checkpoint loaded')
        from .sampling.humanize import collect_unique

        def round_fn():
            res = self.nano(vhh_seq, finetune=self.nano_finetuned,
                            inpaint=method == 'inpaint')
            if res is None:
                return None
            return res['seqs'] if sample_number > 1 else [res['best']]

        with self._lock:
            unique, failed = collect_unique(round_fn, sample_number,
                                            max_retry)
        if failed and not unique:
            raise ValueError('sequence did not align / no valid candidates')
        return {'candidates': [{'vhh_seq': s} for s in unique]}

    def graft(self, h_seq: str, l_seq: str,
              back_mutation: bool = False) -> Dict:
        from .numbering import germline as G
        h, l = G.cdr_pair_grafting(h_seq, l_seq, back_mutation=back_mutation)
        return {'h_seq': h, 'l_seq': l}

    def health(self) -> Dict:
        import jax
        models = ([] + (['ab'] if self.ab else [])
                  + (['nano'] if self.nano else []))
        return {'status': 'ok', 'models': models,
                'device': str(jax.devices()[0])}


def make_handler(service: HumanizationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: Dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/health':
                self._reply(200, service.health())
            else:
                self._reply(404, {'error': f'unknown path {self.path}'})

        def do_POST(self):
            try:
                n = int(self.headers.get('Content-Length', 0))
                req = json.loads(self.rfile.read(n) or b'{}')
            except (ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {'error': f'bad JSON: {e}'})
            if not isinstance(req, dict):
                return self._reply(
                    400, {'error': 'JSON body must be an object'})
            try:
                if self.path == '/humanize/ab':
                    out = service.humanize_ab(
                        req['h_seq'], req['l_seq'],
                        sample_number=int(req.get('sample_number', 1)),
                        method=req.get('method', 'FR'))
                elif self.path == '/humanize/nano':
                    out = service.humanize_nano(
                        req['vhh_seq'],
                        sample_number=int(req.get('sample_number', 1)),
                        method=req.get('method', 'FR'))
                elif self.path == '/graft':
                    out = service.graft(
                        req['h_seq'], req['l_seq'],
                        back_mutation=bool(req.get('back_mutation', False)))
                else:
                    return self._reply(404,
                                       {'error': f'unknown path {self.path}'})
            except KeyError as e:
                return self._reply(400, {'error': f'missing field {e}'})
            except ValueError as e:
                return self._reply(422, {'error': str(e)})
            self._reply(200, out)

    return Handler


def serve(service: HumanizationService, host: str = '127.0.0.1',
          port: int = 8000) -> ThreadingHTTPServer:
    """Create (but do not start) the HTTP server; call serve_forever() or
    run it from a thread. port=0 picks an ephemeral port (tests)."""
    return ThreadingHTTPServer((host, port), make_handler(service))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--ab-ckpt', default=None)
    p.add_argument('--nano-ckpt', default=None)
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--batch-size', type=int, default=16)
    p.add_argument('--positions-per-step', type=int, default=1)
    p.add_argument('--seed', type=int, default=2023)
    p.add_argument('--fp32', action='store_true')
    p.add_argument('--no-warmup', action='store_true')
    args = p.parse_args(argv)
    if not args.ab_ckpt and not args.nano_ckpt:
        p.error('need --ab-ckpt and/or --nano-ckpt')
    service = HumanizationService(
        args.ab_ckpt, args.nano_ckpt, batch_size=args.batch_size,
        positions_per_step=args.positions_per_step, seed=args.seed,
        use_bf16=not args.fp32, warmup=not args.no_warmup)
    srv = serve(service, args.host, args.port)
    print(f'serving on http://{srv.server_address[0]}:{srv.server_address[1]}'
          f' (models: {service.health()["models"]})')
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return srv


if __name__ == '__main__':
    main()
