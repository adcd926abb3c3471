"""End-to-end user journey on the real TPU chip.

Quantize a tiny random llama with GANQ (Pallas S-step), save the packed
checkpoint, load it back (backend auto-selection), generate on all three
backends (reference / pallas / pallas_a8 after optimize()), and serve one
HTTP request — the round-trip a user of the framework takes.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/verify_e2e_tpu.py
"""
import json
import tempfile
import time
import urllib.request

import numpy as np
import jax

print("devices:", jax.devices(), flush=True)

import torch
import transformers

from ganq_tpu import GanqModel, QuantizeConfig

hf_cfg = transformers.LlamaConfig(
    vocab_size=512, hidden_size=256, intermediate_size=512,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256)
torch.manual_seed(0)
tm = transformers.LlamaForCausalLM(hf_cfg)

rng = np.random.default_rng(0)
qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=3,
                      act_sort="asc", l_damp_style="ganq", dead="mean")
m = GanqModel.from_torch_model(tm, qcfg)
t0 = time.time()
logrows = m.quantize([rng.integers(1, 512, size=(64,)).astype(np.int32)
                      for _ in range(4)], batch_size=2)
print(f"quantized {len(logrows)} modules in {time.time()-t0:.1f}s "
      f"(pallas S-step on TPU)", flush=True)

d = tempfile.mkdtemp()
m.save(d)
q = GanqModel.load(d)
print("loaded; auto backend:", q.backend, flush=True)

prompt = rng.integers(1, 512, size=(1, 12)).astype(np.int32)
t0 = time.time()
out_ref = q.generate(prompt, max_new_tokens=8, max_seq=64)
print(f"generate (reference-or-auto): {out_ref.tolist()} {time.time()-t0:.1f}s",
      flush=True)

q.backend = "pallas"
out_pal = q.generate(prompt, max_new_tokens=8, max_seq=64)
print(f"generate (pallas):           {out_pal.tolist()}", flush=True)

q.optimize()
print("optimized backend:", q.backend, flush=True)
out_a8 = q.generate(prompt, max_new_tokens=8, max_seq=64)
print(f"generate ({q.backend}):       {out_a8.tolist()}", flush=True)

agree = np.mean(out_ref == out_pal)
print(f"ref-vs-pallas token agreement: {agree:.2f}", flush=True)

srv = q.serve(port=0)
srv.wait_until_ready()
req = urllib.request.Request(
    f"http://127.0.0.1:{srv.port}/v1/completions",
    data=json.dumps({"prompt": "hello", "max_tokens": 4}).encode(),
    headers={"Content-Type": "application/json"})
try:
    with urllib.request.urlopen(req) as r:
        resp = json.loads(r.read())
    print("server error (expected: no tokenizer):", resp)
except urllib.error.HTTPError as e:
    print(f"server returned {e.code} for string prompt without tokenizer "
          f"(clean error): {e.read()[:80]}", flush=True)
srv.shutdown()

# --- AutoRound method + lossless mlx export (round-1 additions)
torch.manual_seed(1)
tm2 = transformers.LlamaForCausalLM(hf_cfg)
m2 = GanqModel.from_torch_model(
    tm2, QuantizeConfig(bits=4, group_size=64, quant_method="auto_round",
                        autoround_iters=40))
t0 = time.time()
m2.quantize([rng.integers(1, 512, size=(48,)).astype(np.int32)
             for _ in range(3)], batch_size=1)
print(f"autoround quantized in {time.time()-t0:.1f}s", flush=True)
d2 = tempfile.mkdtemp()
m2.save(d2)
q2 = GanqModel.load(d2)
out_ar = q2.generate(prompt, max_new_tokens=6, max_seq=64)
print(f"autoround generate ({q2.backend}): {out_ar.tolist()}", flush=True)
mlx_dir = tempfile.mkdtemp()
stats = q2.export_mlx(mlx_dir)
print(f"mlx export: {stats}", flush=True)
assert stats["quantized"] > 0

print("E2E OK", flush=True)
