"""End-to-end training validation on synthetic data (runs on the real TPU).

50-class tone classification through the actual ESC-50 recipe (CE + mixup
+ patchout + SpecAugment + warmup/rampdown schedule + SWA) with a reduced
PaSST (depth 4, dim 192). Chance is 2%; the run reaches >90% accuracy in
45 epochs (~16 min on one v5e core), with SWA beating the raw weights —
observed: raw 0.885, SWA 0.900 (2026-08-16, commit history).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, tempfile, time
import numpy as np

from passt_tpu.config import apply_overrides
from passt_tpu.data.prepare import pack_waveform_hdf5
from passt_tpu.experiments import EXPERIMENTS
import passt_tpu.models.registry as registry

rng = np.random.default_rng(0)
sr = 32000
freqs = 100 * (8000/100) ** (np.arange(50)/49)  # log-spaced 100..8000 Hz
def make_split(n_per, seed):
    r = np.random.default_rng(seed)
    items = []
    for c, f in enumerate(freqs):
        for i in range(n_per):
            t = np.arange(sr) / sr
            phase = r.uniform(0, 2*np.pi)
            amp = r.uniform(0.2, 0.8)
            wave = amp*np.sin(2*np.pi*f*t + phase) + 0.05*r.standard_normal(sr)
            items.append((f"c{c}_{i}.wav", wave.astype(np.float32), np.asarray(c)))
    r.shuffle(items)
    return items

tmp = tempfile.mkdtemp()
pack_waveform_hdf5(tmp+"/train.h5", make_split(20, 1), packed_targets=False)
pack_waveform_hdf5(tmp+"/test.h5", make_split(4, 2), packed_targets=False)

exp = EXPERIMENTS["esc50"]
spec = registry.ARCHS["passt_s_swa_p16_128_ap476"]
registry.ARCHS["passt_s_swa_p16_128_ap476"] = dataclasses.replace(spec, depth=4, embed_dim=192, num_heads=6)

cfg = apply_overrides(exp.default_config, {
    "data.train_hdf5": tmp+"/train.h5",
    "data.eval_hdf5": tmp+"/test.h5",
    "data.clip_length": "1",
    "data.batch_size": "25",
    "data.eval_batch_size": "50",
    "model.input_tdim": "98",
    "model.s_patchout_t": "2",
    "model.s_patchout_f": "1",
    "model.dtype": "bfloat16",
    "trainer.lr": "3e-4",
    "trainer.max_epochs": "45",
    "trainer.warm_up_len": "1",
    "trainer.ramp_down_start": "30",
    "trainer.ramp_down_len": "12",
    "trainer.swa_epoch_start": "30",
    "trainer.swa_freq": "1",
    "trainer.log_every_steps": "400",
    "mel.freqm": "8",
    "mel.timem": "8",
})
t0 = time.time()
res = exp.main(cfg)
h = res["history"]
print(f"\nwall: {time.time()-t0:.0f}s")
print("accuracy by epoch:", [round(r.get("accuracy", -1), 3) for r in h])
print("swa accuracy final:", h[-1].get("swa_accuracy"))
assert max(r.get("accuracy",0) for r in h) > 0.9, "did not converge"
print("CONVERGED")
