"""Full-size PaSST-S (86M params) from-scratch training validation on real
TPU: 50-tone multilabel task through the complete AudioSet recipe (class-
balanced weighted sampler + wavmix + roll + gain + batch mixup + SpecAugment
+ SWA + warmup/rampdown). Observed (2026-08-17, one v5e core, ~6 min wall,
tanh-GELU bf16 + torch-faithful trunc-normal init):
mAP 0.08 -> 0.894 over 12 epochs, ROC-AUC 0.994."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile, time
import numpy as np
from passt_tpu.config import apply_overrides
from passt_tpu.data.prepare import pack_waveform_hdf5
from passt_tpu.experiments import EXPERIMENTS

rng = np.random.default_rng(0)
sr = 32000
freqs = 100 * (8000/100) ** (np.arange(50)/49)
def split(n_per, seed):
    r = np.random.default_rng(seed)
    items = []
    for c, f in enumerate(freqs):
        for i in range(n_per):
            t = np.arange(sr) / sr
            w = r.uniform(0.2,0.8)*np.sin(2*np.pi*f*t + r.uniform(0,2*np.pi)) + 0.05*r.standard_normal(sr)
            y = np.zeros(50); y[c] = 1
            items.append((f"c{c}_{i}.wav", w.astype(np.float32), y))
    r.shuffle(items)
    return items

tmp = tempfile.mkdtemp()
pack_waveform_hdf5(tmp+"/train.h5", split(10, 1))
pack_waveform_hdf5(tmp+"/test.h5", split(3, 2))

exp = EXPERIMENTS["audioset"]
cfg = apply_overrides(exp.default_config, {
    "model.n_classes": "50",
    "model.input_tdim": "98",
    "model.s_patchout_t": "2",
    "model.s_patchout_f": "1",
    "data.num_classes": "50",
    "data.train_hdf5": tmp+"/train.h5",
    "data.eval_hdf5": tmp+"/test.h5",
    "data.clip_length": "1",
    "data.batch_size": "12",
    "data.eval_batch_size": "50",
    "data.epoch_len": "500",
    "data.weighted_sampler": "true",
    "mel.freqm": "8", "mel.timem": "8",
    "trainer.lr": "1e-4",
    "trainer.max_epochs": "12",
    "trainer.warm_up_len": "2",
    "trainer.ramp_down_start": "8",
    "trainer.ramp_down_len": "4",
    "trainer.swa_epoch_start": "8",
    "trainer.swa_freq": "1",
    "trainer.log_every_steps": "40",
})
# extra "key=value" overrides from argv (e.g. the bf16+SR optimizer knob:
# python scripts/fullsize_train_demo.py trainer.opt_moments_dtype=bfloat16_sr)
if len(sys.argv) > 1:
    cfg = apply_overrides(cfg, dict(kv.split("=", 1) for kv in sys.argv[1:]))
    print("extra overrides:", sys.argv[1:])
t0 = time.time()
res = exp.main(cfg)
h = res["history"]
print(f"wall {time.time()-t0:.0f}s; ap by epoch:", [round(r.get("ap",-1),3) for r in h])
print("final swa_ap:", h[-1].get("swa_ap"))
