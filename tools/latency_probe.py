"""Single-clip serving latency: wav[16000] -> feature graph -> CNN8 + VGG
-> validation-weighted ensemble probability, as ONE jitted graph.

Through this environment's relay a host sync costs ~35 ms, which would
swamp a single-clip measurement, so the probe chains N data-DEPENDENT
iterations inside one jit (clip i+1 is perturbed by a function of output i,
forcing sequential execution) and reports total/N — device-side latency,
one sync for the whole chain. Batch-1 and batch-8 (micro-batched serving)
variants.

Usage: python tools/latency_probe.py [n_iters]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_breath.config import DEFAULT_FEATURES as SPEC, TrainCfg
    from tpu_breath.features import extract_features
    from tpu_breath.models import registry
    from tpu_breath.augment import Batch
    from tpu_breath.train.loop import create_state

    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:8]
    from tpu_breath.data import wav as wav_io
    wavs = wav_io.load_wav_batch(paths, SPEC.expected_len)

    # fresh-init params (latency depends on shapes, not weights); softmax
    # ensemble weights from two nominal val accs
    f0, s0 = jax.jit(lambda w: extract_features(w, SPEC))(jnp.asarray(wavs[:2]))
    sample = Batch(f0, s0, jnp.zeros(2, jnp.float32))
    models, states = [], []
    for arch in ("cnn8", "vgg"):
        m = registry.build(arch, num_scalar_features=SPEC.n_scalars)
        st, _, _ = create_state(m, jax.random.PRNGKey(0), TrainCfg(),
                                steps_per_epoch=1, sample_batch=sample)
        models.append(m)
        states.append(st)
    w = np.exp([0.79, 0.80])
    w = jnp.asarray(w / w.sum(), jnp.float32)

    def serve(y):  # y[B, 16000] -> ensemble prob[B]
        f, s = extract_features(y, SPEC)
        p = 0.0
        for m, st, wi in zip(models, states, w):
            logits = m.apply({"params": st.params,
                              "batch_stats": st.batch_stats},
                             f, s, train=False)
            p = p + wi * jax.nn.sigmoid(logits)
        return p

    for b in (1, 8):
        x = jnp.asarray(wavs[:b])

        @jax.jit
        def chain(y0):
            def body(y, _):
                p = serve(y)
                # data dependency: next input perturbed by this output
                y2 = y + (p[:, None] * 1e-6)
                return y2, jnp.sum(p)

            _, ps = lax.scan(body, y0, None, length=N)
            return jnp.sum(ps)

        t0 = time.perf_counter(); float(chain(x))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chain(x))
        dt = time.perf_counter() - t0
        print(f"batch {b}: {dt / N * 1e3:7.2f} ms/step "
              f"({dt / N / b * 1e3:7.2f} ms/clip device latency, "
              f"{N} chained iters, compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
