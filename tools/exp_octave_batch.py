"""Test: per-octave match/track calls (Ks=512/256/128) vs ONE vmapped K=512 call.

If fixed per-kernel overheads dominate the [K,K] stages, batching octaves into
a uniform-K vmap wins despite ~2.3x more FLOPs.
Slope-timed over scan length so RTT cancels.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rso.config import RSOConfig
    import dataclasses
    from rso.frontend.detect import Features
    from rso.frontend.stereo_match import match_left_right
    from rso.frontend.track import track_interframe
    from rso.synthetic import synthetic_config

    cfg = synthetic_config()
    Ks = [512, 256, 128]
    W = 1241
    rng = np.random.default_rng(0)

    def mk(K, w):
        return Features(
            xy=jnp.asarray(np.stack([rng.uniform(8, w - 8, K),
                                     rng.uniform(8, 370 // (W // w) - 8, K)], -1),
                           jnp.float32),
            response=jnp.asarray(rng.uniform(1, 100, K), jnp.float32),
            valid=jnp.ones((K,), bool),
            desc=jnp.zeros((K, 8), jnp.uint32),
            patch=jnp.asarray(rng.uniform(0, 255, (K, 64)), jnp.float32),
        )

    per_oct = [(mk(K, W >> o), mk(K, W >> o)) for o, K in enumerate(Ks)]
    # padded uniform-K copies (invalid tail slots)
    def pad(f, K):
        n = f.xy.shape[0]
        if n == K:
            return f
        z = Features(
            xy=jnp.zeros((K, 2), jnp.float32).at[:n].set(f.xy),
            response=jnp.zeros((K,), jnp.float32).at[:n].set(f.response),
            valid=jnp.zeros((K,), bool).at[:n].set(f.valid),
            desc=jnp.zeros((K, 8), jnp.uint32).at[:n].set(f.desc),
            patch=jnp.zeros((K, 64), jnp.float32).at[:n].set(f.patch),
        )
        return z
    Kmax = 512
    batched = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[(pad(l, Kmax), pad(r, Kmax)) for l, r in per_oct])

    N1, N2, PASSES = 40, 200, 4

    def slope(body, carry0):
        def timer(n):
            run = jax.jit(lambda: lax.scan(body, carry0, None, length=n)[0])
            jax.block_until_ready(run())
            best = 1e9
            for _ in range(PASSES):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            return best
        return (timer(N2) - timer(N1)) / (N2 - N1) * 1e3

    def seq_match(carry, _):
        out = carry * 1e-30
        for o, (l, r) in enumerate(per_oct):
            l2 = l._replace(response=l.response + out)
            m = match_left_right(l2, r, cfg.lr_match, W >> o, 0.0,
                                 fx_baseline=718.0 * 0.54 / 2 ** o,
                                 use_mxu=True)
            out = out + jnp.sum(m.dist)
        return out, None

    def bat_match(carry, _):
        out = carry * 1e-30
        l, r = batched
        l = l._replace(response=l.response + out)
        m = jax.vmap(lambda a, b: match_left_right(
            a, b, cfg.lr_match, W, 0.0, fx_baseline=718.0 * 0.54,
            use_mxu=True))(l, r)
        return jnp.sum(m.dist), None

    t_seq = slope(seq_match, jnp.float32(0.0))
    print(f"match 3 per-octave calls     {t_seq:8.4f} ms", flush=True)
    t_bat = slope(bat_match, jnp.float32(0.0))
    print(f"match 1 vmapped K=512 call   {t_bat:8.4f} ms", flush=True)

    ifm = dataclasses.replace(cfg.if_match, filter_fund_matrix=False)
    key = jax.random.PRNGKey(0)

    def seq_track(carry, _):
        out = carry * 1e-30
        for o, (l, r) in enumerate(per_oct):
            m = match_left_right(l, r, cfg.lr_match, W >> o, 0.0, use_mxu=True)
            l2 = l._replace(response=l.response + out)
            trk = track_interframe(l2, r, m, l, r, m, ifm, key, use_mxu=True)
            out = out + trk.n_tracked.astype(jnp.float32)
        return out, None

    def bat_track(carry, _):
        out = carry * 1e-30
        l, r = batched
        m = jax.vmap(lambda a, b: match_left_right(
            a, b, cfg.lr_match, W, 0.0, use_mxu=True))(l, r)
        l2 = l._replace(response=l.response + out)
        trk = jax.vmap(lambda pl, pr, pm, cl, cr, cm: track_interframe(
            pl, pr, pm, cl, cr, cm, ifm, key, use_mxu=True))(
            l2, r, m, l, r, m)
        return jnp.sum(trk.n_tracked.astype(jnp.float32)), None

    t_seq_t = slope(seq_track, jnp.float32(0.0))
    print(f"match+track per-octave       {t_seq_t:8.4f} ms", flush=True)
    t_bat_t = slope(bat_track, jnp.float32(0.0))
    print(f"match+track vmapped          {t_bat_t:8.4f} ms", flush=True)
    print(f"backend: {jax.default_backend()}")


if __name__ == "__main__":
    main()
