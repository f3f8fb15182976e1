"""Probe: isolate which replay-buffer ingredient trips the TPU backend.

Round-4 incident: the DAgger reservoir-replay epoch compiled but the first
execution died with `INVALID_ARGUMENT: TPU backend error` (opaque, raised at
the first device->host fetch). The same graph runs on CPU. Ingredients under
suspicion, each tested standalone on the real chip:
  A. f16 scatter-set with mode="drop" and deliberately out-of-range slots
  B. donated carry holding a multi-GB f16 buffer
  C. randint-indexed gather from f16 + cast back to f32
Run: python probe_replay_tpu.py
"""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def check(name, fn, *args, **jit_kw):
    try:
        out = jax.jit(fn, **jit_kw)(*args)
        out = jax.tree_util.tree_map(lambda x: np.asarray(x), out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        print(f"{name}: OK (leaf sum {np.asarray(leaf, np.float64).sum():.4f})")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


K, B, D = 4096, 512, 16

buf = jnp.zeros((K, D), jnp.float16)
vals = jnp.ones((B, D), jnp.float32)
slot_in = jnp.arange(B, dtype=jnp.int32)
slot_oob = jnp.concatenate([jnp.arange(B // 2, dtype=jnp.int32),
                            jnp.full((B // 2,), K, jnp.int32)])  # half dropped

check("A1 f16 scatter in-range drop-mode",
      lambda b, v, s: b.at[s].set(v.astype(b.dtype), mode="drop"), buf, vals, slot_in)
check("A2 f16 scatter out-of-range drop-mode",
      lambda b, v, s: b.at[s].set(v.astype(b.dtype), mode="drop"), buf, vals, slot_oob)
check("A3 f32 scatter out-of-range drop-mode",
      lambda b, v, s: b.at[s].set(v, mode="drop"), buf.astype(jnp.float32), vals, slot_oob)

big = jnp.zeros((400_000, 1200 * 3 // 2), jnp.float16)  # ~1.4 GB
check("B donated 1.4GB f16 carry",
      lambda b: b.at[0, 0].add(1.0), big, donate_argnums=0)

idx = jnp.arange(B) % K
check("C f16 gather + cast",
      lambda b, i: b[i].astype(jnp.float32).sum(), buf, idx)

# D: the exact composed pattern from ext_adapt (scatter into donated dict,
# then randint-gather minibatches inside a scan)
def composed(state, vals):
    rbuf, cur = state
    g = cur + jnp.arange(B)
    r = (jax.random.uniform(jax.random.PRNGKey(0), (B,)) * (g + 1).astype(jnp.float32)).astype(jnp.int32)
    slot = jnp.where(g < K, g, jnp.where(r < K, r, K))
    rbuf = rbuf.at[slot].set(vals.astype(rbuf.dtype), mode="drop")

    def mb(c, i):
        x = rbuf[i].astype(jnp.float32)
        return c + x.sum(), None

    perm = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0, K)
    tot, _ = jax.lax.scan(mb, 0.0, perm)
    return (rbuf, cur + B), tot

check("D composed reservoir pattern", composed, (buf, jnp.zeros((), jnp.int32)),
      vals, donate_argnums=0)

# E: REAL-SCALE miniature of the ext_adapt epoch: K=400k, B=16384 (256 envs x
# horizon 64), pcl-sized f16 field + f32 obs fields in one donated dict,
# sequential-fill-then-reservoir slots, traced randint upper bound for the
# minibatch gather. If this fails where A-D pass, the trigger is scale or the
# dict/mixed-dtype composition.
KE, BE = 400_000, 16_384
state_e = dict(
    replay={
        "pcl": jnp.zeros((KE, 1200, 3), jnp.float16),
        "obs": jnp.zeros((KE, 15), jnp.float32),
        "t_actions": jnp.zeros((KE, 6), jnp.float32),
    },
    cursor=jnp.zeros((), jnp.int32),
    fill=jnp.zeros((), jnp.int32),
)
batch_e = dict(
    pcl=jnp.ones((BE, 1200, 3), jnp.float32),
    obs=jnp.ones((BE, 15), jnp.float32),
    t_actions=jnp.ones((BE, 6), jnp.float32),
)


def real_scale(state, batch):
    t = state["cursor"]
    g = t + jnp.arange(BE)
    r = (jax.random.uniform(jax.random.PRNGKey(2), (BE,))
         * (g + 1).astype(jnp.float32)).astype(jnp.int32)
    slot = jnp.where(g < KE, g, jnp.where(r < KE, r, KE))
    replay = {k: state["replay"][k].at[slot].set(
        batch[k].astype(state["replay"][k].dtype), mode="drop")
        for k in state["replay"]}
    fill = jnp.minimum(t + BE, KE)

    def mb(c, i):
        x = replay["pcl"][i].astype(jnp.float32)
        return c + x.mean() + replay["obs"][i].mean(), None

    perm = jax.random.randint(jax.random.PRNGKey(3), (8, 2048), 0,
                              jnp.maximum(fill, 1))
    tot, _ = jax.lax.scan(mb, 0.0, perm)
    return dict(replay=replay, cursor=t + BE, fill=fill), tot


check("E real-scale mixed-dict reservoir epoch", real_scale, state_e, batch_e,
      donate_argnums=0)
print("device:", jax.devices()[0].device_kind)
