"""docs/API.md drift guard.

Every `module.symbol` mention in the API reference must resolve to a
real attribute of the package — so renames/removals fail this test
instead of silently rotting the doc. (The doc is the migration surface
for users coming from the reference — README "Coming from the
reference".)
"""
import importlib
import pathlib
import re

import pytest

DOC = pathlib.Path(__file__).resolve().parents[1] / "docs" / "API.md"
PKG = "vq_vae_transformer_arc_welding_tpu"

# `module.symbol` or `module.sub.symbol` inside backticks, where the
# leading segment is a package module. Skips calls/attrs written with
# parens, glob mentions (`quantized.*`), and non-package tokens.
_MENTION = re.compile(r"`([a-z_][a-z0-9_.]*)`")

_MODULES = {
    "serve", "asimow", "datasets", "latent", "scaler", "splits",
    "streaming", "synthetic", "windowed", "vqvae_patch", "transformer",
    "mlp", "gru", "mlp_embedding", "embedding", "initializers",
    "quantized", "plot_helper", "base", "activations", "attention",
    "conv", "norm", "patching", "vq", "vq_ema", "pallas_vq",
    "pallas_attn", "pallas_attn_quant", "pallas_mlp_quant",
    "pallas_block_quant", "pallas_encoder", "pallas_decode", "mesh",
    "sharding", "ring_attention", "pipeline", "loop", "optim",
    "metrics", "tasks", "checkpoint", "torch_import", "encoder",
    "losses", "eval_protocols", "ts2vec", "utils", "compilecache",
    "names", "random",
}

_PARENTS = {
    "serve": PKG,
    "asimow": f"{PKG}.data", "datasets": f"{PKG}.data",
    "latent": f"{PKG}.data", "scaler": f"{PKG}.data",
    "splits": f"{PKG}.data", "streaming": f"{PKG}.data",
    "synthetic": f"{PKG}.data", "windowed": f"{PKG}.data",
    "vqvae_patch": f"{PKG}.models", "transformer": f"{PKG}.models",
    "mlp": f"{PKG}.models", "gru": f"{PKG}.models",
    "mlp_embedding": f"{PKG}.models", "embedding": f"{PKG}.models",
    "initializers": f"{PKG}.models", "quantized": f"{PKG}.models",
    "plot_helper": f"{PKG}.models", "base": f"{PKG}.models",
    "activations": f"{PKG}.ops", "attention": f"{PKG}.ops",
    "conv": f"{PKG}.ops", "norm": f"{PKG}.ops",
    "patching": f"{PKG}.ops", "vq": f"{PKG}.ops",
    "vq_ema": f"{PKG}.ops", "pallas_vq": f"{PKG}.ops",
    "pallas_attn": f"{PKG}.ops", "pallas_attn_quant": f"{PKG}.ops",
    "pallas_mlp_quant": f"{PKG}.ops", "pallas_block_quant": f"{PKG}.ops",
    "pallas_encoder": f"{PKG}.ops", "pallas_decode": f"{PKG}.ops",
    "mesh": f"{PKG}.parallel", "sharding": f"{PKG}.parallel",
    "ring_attention": f"{PKG}.parallel", "pipeline": f"{PKG}.parallel",
    "loop": f"{PKG}.train", "optim": f"{PKG}.train",
    "metrics": f"{PKG}.train", "tasks": f"{PKG}.train",
    "checkpoint": f"{PKG}.train", "torch_import": f"{PKG}.train",
    "encoder": f"{PKG}.ts2vec", "losses": f"{PKG}.ts2vec",
    "eval_protocols": f"{PKG}.ts2vec", "ts2vec": f"{PKG}.ts2vec",
    "utils": f"{PKG}.ts2vec",  # `utils.*` mentions in the ts2vec section
    "compilecache": f"{PKG}.utils", "names": f"{PKG}.utils",
    "random": f"{PKG}.utils",
}

# doc-namespace mentions where the first segment is a package, e.g.
# `log.select.select_logger`, `utils.names.generate_funny_name`
_NAMESPACED = {"log", "utils", "data", "models", "ops", "parallel",
               "train"}


def _mentions():
    text = DOC.read_text()
    out = []
    for m in _MENTION.finditer(text):
        token = m.group(1)
        if "." not in token or token.endswith("."):
            continue
        parts = token.split(".")
        if any(p == "*" or not p for p in parts):
            continue
        out.append(token)
    return sorted(set(out))


def test_api_doc_symbols_resolve():
    assert DOC.exists(), "docs/API.md missing"
    mentions = _mentions()
    assert len(mentions) > 40, f"suspiciously few mentions: {len(mentions)}"
    unresolved = []
    for token in mentions:
        parts = token.split(".")
        head = parts[0]
        if head in _NAMESPACED:
            modpath = f"{PKG}." + ".".join(parts[:-1])
            attr = parts[-1]
        elif head in _MODULES:
            modpath = f"{_PARENTS[head]}.{head}"
            attr = parts[1]
        else:
            continue  # prose token like `jax.jit`, `.env`, filenames
        try:
            mod = importlib.import_module(modpath)
        except ImportError:
            # e.g. `log.select.select_logger`: try one level up with a
            # nested attribute chain
            try:
                mod = importlib.import_module(
                    f"{PKG}." + ".".join(parts[:-2])) if len(parts) > 2 \
                    else None
            except ImportError:
                mod = None
            if mod is None:
                unresolved.append(token)
                continue
            attr = parts[-2]
        obj = getattr(mod, attr, None)
        if obj is None and head in _MODULES:
            # module name shadowed across subpackages (e.g. models.gru
            # vs ops.gru): try the other homes before failing
            for parent in (f"{PKG}.ops", f"{PKG}.models", f"{PKG}.data",
                           f"{PKG}.train", f"{PKG}.parallel",
                           f"{PKG}.utils", f"{PKG}.ts2vec"):
                try:
                    alt = importlib.import_module(f"{parent}.{head}")
                except ImportError:
                    continue
                obj = getattr(alt, attr, None)
                if obj is not None:
                    break
        if obj is None:
            unresolved.append(token)
    assert not unresolved, f"docs/API.md mentions unresolved symbols: {unresolved}"
