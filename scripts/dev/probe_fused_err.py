"""Quantify int8 embedding perturbation (fused-LN path) vs bf16, tiny-clip."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from bayesvlm_tpu.models.encoders import load_model

rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)

def embeds(**kw):
    img_enc, _, _ = load_model("tiny-clip", dtype=jnp.bfloat16, seed=0, **kw)
    return np.asarray(img_enc(imgs).embeds, np.float32)

e_bf = embeds()
e_i8 = embeds(mlp_int8=True)
print("rel-L2 int8 vs bf16:", np.linalg.norm(e_i8 - e_bf) / np.linalg.norm(e_bf))
