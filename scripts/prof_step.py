import sys; sys.path.insert(0, "/root/repo")
import numpy as np, glob, re, shutil, jax, jax.numpy as jnp
from unetsulc_tpu.models.unet3d import UNet3D, make_apply_fn
from unetsulc_tpu.train.step import TrainState, make_train_step
from unetsulc_tpu.utils.profiling import summarize_xplane

model = UNet3D(in_channels=1, out_channels=63, init_channel_number=64,
               compute_dtype=jnp.bfloat16, pallas_blocks=True)
rng = np.random.default_rng(0)
V = 96
x = jnp.asarray((rng.random((1, V, V, V, 1)) < 0.1).astype(np.float32))
labels = jnp.asarray(np.where(rng.random((1, V, V, V)) < 0.5,
                              rng.integers(0, 63, (1, V, V, V)), -1).astype(np.int32))
params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 8, 1)), train=True)["params"]
step = make_train_step(make_apply_fn(model), num_classes=63, donate=False)
state = TrainState.create(params, lr=0.01)
state, loss, _ = step(state, x, labels)
float(loss)
import jax.profiler
shutil.rmtree("/tmp/prof_step", ignore_errors=True)
jax.profiler.start_trace("/tmp/prof_step")
for _ in range(5):
    state, loss, _ = step(state, x, labels)
    float(loss)
jax.profiler.stop_trace()
p = sorted(glob.glob("/tmp/prof_step/**/*.xplane.pb", recursive=True))[-1]
rows = summarize_xplane(p, top=100000)

N = 5.0
def categorize(h):
    if "tpu_custom_call" in h:
        m = re.match(r"%\S+ = (\S+) custom-call", h)
        out = m.group(1) if m else "?"
        return f"pallas {out}"
    m = re.match(r"%\S+ = \S+ (\w+)", h)
    return m.group(1) if m else h[:40]

from collections import defaultdict
agg = defaultdict(float); cnt = defaultdict(int)
for us, h in rows:
    c = categorize(h)
    agg[c] += us / N / 1000.0
    cnt[c] += 1
tot = sum(agg.values())
print(f"TOTAL per-step device: {tot:.1f} ms")
for c, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{ms:8.3f} ms  x{cnt[c]//5:4d}  {c}")
print("\n--- top individual fusions ---")
for us, h in rows:
    if "custom-call" not in h and us / N > 0.25:
        print(f"{us/N/1000.0:8.3f} ms  {h[:220]}")

print("\n--- all non-pallas ops > 0.05 ms ---")
for us, h in rows:
    if "custom-call" not in h and us / N > 0.05:
        print(f"{us/N/1000.0:8.3f} ms  {h[:150]}")
print("\n--- all pallas calls ---")
for us, h in rows:
    if "custom-call" in h:
        print(f"{us/N/1000.0:8.3f} ms  {h[:150]}")
