import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np, re
from pwcnet_tpu.models import PWCDCNet
from pwcnet_tpu.ops.pallas import cost_volume_pallas, warped_cost_volume
from pwcnet_tpu.train_lib import create_train_state, make_train_step
from pwcnet_tpu.utils.profiling import op_profile

model = PWCDCNet(dtype=jnp.bfloat16, cost_volume_fn=cost_volume_pallas,
                 warp_cv_fn=warped_cost_volume)
state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3), learning_rate=1e-4)
step = make_train_step(model, donate=False)
rng = np.random.default_rng(0)
b,h,w = 4,384,448
images = jnp.asarray(rng.random((b,2,h,w,3)).astype(np.float32))
flows = jnp.asarray(rng.standard_normal((b,h,w,2)).astype(np.float32))
def f(s, im, fl):
    return step(s, im, fl)  # full state returned: nothing DCE-able
rows = op_profile(f, state, images, flows, iters=3)
tot = sum(r["ms_per_iter"] for r in rows)
print("TOTAL sync ms/iter: %.2f" % tot)

def bucket(name):
    if "transpose_jvp" in name and "custom-call" in name: return "pallas CV bwd"
    if "jvp" in name and "custom-call" in name: return "pallas CV fwd"
    if re.search(r"= f32\[\]", name): return "scalar reductions"
    if re.search(r"\[\d+,2,2,\d+\]", name): return "warp patch gather/scatter"
    if re.search(r"\[44688,\d+\]|\[11344,\d+\]|\[2896,\d+\]", name): return "warp scatter rows"
    if name.startswith("%copy"): return "layout copies"
    if "convolution" in name: return "convs"
    return "other fusions"
from collections import defaultdict
agg = defaultdict(float)
for r in rows: agg[bucket(r["name"])] += r["ms_per_iter"]
for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
    print("%8.3f ms  %s" % (v, k))
print("--- top 25 ---")
for r in rows[:25]:
    print("%8.3f ms  %s" % (r["ms_per_iter"], r["name"][:100]))
