#!/usr/bin/env python
"""One-command serving stack: controller + engine-backed worker +
web chat UI + OpenAI-compatible API, on a tiny random-weight model.

The production shape of the stack (swap ``tiny`` for a converted
checkpoint and ``pack_params`` for your calibrated tree):

    controller (registry/heartbeat/dispatch)
      └─ worker (continuous-batching engine, streams NUL-delimited JSON)
           ├─ web UI      http://127.0.0.1:7860
           └─ OpenAI API  http://127.0.0.1:8000/v1

Run: python examples/serve_stack.py [--packed] [--port-base 21001]
Then:  curl http://127.0.0.1:8000/v1/models
       curl -X POST http://127.0.0.1:8000/v1/completions \
            -d '{"model": "tiny-llama", "prompt": "1 2 3", "max_tokens": 8}'
"""

import argparse
import threading

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packed", action="store_true",
                    help="serve MX-FP6 packed weights via the fused GEMV")
    ap.add_argument("--port-base", type=int, default=21001)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    args = ap.parse_args()

    from microscopiq_tpu.models import LlamaConfig, LlamaForCausalLM
    from microscopiq_tpu.serve.controller import serve_controller
    from microscopiq_tpu.serve.engine import (BatchEngine,
                                              engine_generate_stream_fn)
    from microscopiq_tpu.serve.openai_api import serve_openai
    from microscopiq_tpu.serve.web_server import serve_web
    from microscopiq_tpu.serve.worker import ModelWorker, serve_worker

    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))
    if args.packed:
        from microscopiq_tpu.nn import pack_params
        from microscopiq_tpu.specs import finalize_mx_specs

        specs = finalize_mx_specs({"w_elem_format": "fp6_e3m2",
                                   "scale_bits": 8, "block_size": 32})
        params = {"params": pack_params(params["params"], specs)}

    class HashTok:
        """Stand-in tokenizer (real runs pass a HF tokenizer)."""

        eos_token_id = 1

        def encode(self, s):
            return [2] + [2 + hash(w) % (cfg.vocab_size - 3)
                          for w in s.split()]

        def decode(self, ids):
            return " ".join(f"<{i}>" for i in ids)

    engine = BatchEngine(model, params, n_slots=4, max_len=128)
    gen = engine_generate_stream_fn(engine, HashTok())

    base = args.port_base
    ctrl_srv = serve_controller("127.0.0.1", base)
    threading.Thread(target=ctrl_srv.serve_forever, daemon=True).start()
    ctrl = f"http://127.0.0.1:{base}"

    w_srv = serve_worker(ModelWorker(
        ctrl, f"http://127.0.0.1:{base + 1}", ["tiny-llama"], gen,
        register=False), "127.0.0.1", base + 1)
    threading.Thread(target=w_srv.serve_forever, daemon=True).start()
    w_srv.worker.register_to_controller()

    web = serve_web(ctrl, "127.0.0.1", 7860, log_dir=".")
    threading.Thread(target=web.serve_forever, daemon=True).start()
    oai = serve_openai(ctrl, "127.0.0.1", 8000)
    print(f"controller  {ctrl}\n"
          f"worker      http://127.0.0.1:{base + 1}\n"
          f"web UI      http://127.0.0.1:7860\n"
          f"openai API  http://127.0.0.1:8000/v1  (Ctrl-C to stop)",
          flush=True)
    oai.serve_forever()


if __name__ == "__main__":
    main()
