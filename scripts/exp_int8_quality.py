"""Experiment: attribute the int8 operating point's acc/ECE/aPE drift
(VERDICT r4 next #2/#8 — "int8 within tolerance of bf16, or a checked-in
attribution of the drift").

Two questions:

1. EXECUTION vs TRAINING origin: evaluate the SAME QAT weights on (a) the
   int8 MXU executable and (b) the fake-quant float executable. The two
   are bit-exactness-matched by construction (tests/test_int8_path.py), so
   any acc/ECE/aPE difference between the int8 row and the bf16 row that
   does NOT appear between (a) and (b) is a property of the QAT WEIGHTS,
   not of int8 execution.

2. QAT recipe: does fine-tuning the quantized net FROM the float-trained
   weights (standard QAT practice) close the gap vs training quantized
   from scratch (the reference's recipe, ``train_qkeras_mcme.py``)?

Writes scripts/exp_int8_quality.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bayestpu.core.config import BayesConfig, QuantConfig

_spec = importlib.util.spec_from_file_location(
    "benchmod", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

QAT = QuantConfig(total_bits=8, integer_bits=0)


def _round(mets):
    return {k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in mets.items()}


def evaluate_on(variables, int8: bool):
    """acc/ECE/aPE of given weights on the int8 vs fake-quant executable."""
    import jax

    from bayestpu.data.datasets import get_dataset
    from bayestpu.engine.engine import BayesEngine
    from bayestpu.nn.zoo import get_model

    ds = get_dataset("cifar10", synth_difficulty="hard")
    q = bench.INT8_Q if int8 else QAT
    model = get_model("vgg11_me", bayes=BayesConfig(rate=0.25), fused=True,
                      dtype=jnp.bfloat16, quant=q)
    eng = BayesEngine(model, BayesConfig(rate=0.25)).attach(variables)
    return eng.evaluate(jnp.asarray(ds.x_test[:2000]),
                        jnp.asarray(ds.y_test[:2000]),
                        num_samples=bench.MC_SAMPLES,
                        ood_check=True, dataset="cifar10")


def main():
    out = {"model": "vgg11_me hard-synthetic operating point"}

    print("== float baseline ==", flush=True)
    _, float_vs, mets_bf16, _ = bench.train_flagship()
    out["bf16_float_trained"] = _round(mets_bf16)
    print(json.dumps(out["bf16_float_trained"]), flush=True)

    print("== QAT from scratch ==", flush=True)
    _, qat_vs, mets_scratch, _ = bench.train_flagship(quant=QAT)
    out["int8_qat_scratch"] = _round(mets_scratch)
    print(json.dumps(out["int8_qat_scratch"]), flush=True)

    # both legs of the execution-origin comparison run through the SAME
    # evaluate_on code path (code-review r5: one leg via train_flagship's
    # internal eval would be apples-to-oranges)
    print("== same QAT weights: int8 executable ==", flush=True)
    mets_i8 = evaluate_on(qat_vs, int8=True)
    out["qat_scratch_on_int8_executable"] = _round(mets_i8)
    print(json.dumps(out["qat_scratch_on_int8_executable"]), flush=True)

    print("== same QAT weights on the fake-quant float executable ==",
          flush=True)
    mets_fq = evaluate_on(qat_vs, int8=False)
    out["qat_scratch_on_fakequant_float"] = _round(mets_fq)
    print(json.dumps(out["qat_scratch_on_fakequant_float"]), flush=True)

    print("== QAT fine-tuned from float weights ==", flush=True)
    _, ft_vs, mets_ft, _ = bench.train_flagship(
        quant=QAT, init_from=float_vs, epochs=6, lr=0.01)
    out["int8_qat_finetuned_from_float"] = _round(mets_ft)
    print(json.dumps(out["int8_qat_finetuned_from_float"]), flush=True)

    exe = {k: round(abs(out["qat_scratch_on_int8_executable"][k]
                        - out["qat_scratch_on_fakequant_float"][k]), 5)
           for k in ("acc", "ece_hist", "aPE", "aPE_ood")}
    out["execution_origin_delta"] = exe
    out["conclusion"] = (
        "int8-executable vs fake-quant-float rows agree to ~measurement "
        "noise on identical QAT weights -> the acc/ECE/aPE drift vs the "
        "bf16 row is a property of the QAT WEIGHTS (training recipe), not "
        "of int8 execution; see the finetuned row for the recipe fix."
        if max(exe.values()) < 0.02 else
        "execution-origin drift detected - int8 executable disagrees with "
        "fake-quant on identical weights; investigate kernels.")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_int8_quality.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=2)
    print("wrote", path, flush=True)
    print(out["conclusion"])


if __name__ == "__main__":
    main()
