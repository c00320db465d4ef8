"""Learning sanity check: tiny AVE on class-correlated synthetic data.

Event segments carry a class-specific tone + class-colored image patch
(SyntheticAVEDataset(learnable=True)); with FROZEN random backbones the
adapters + heads must still push accuracy well above chance if the training
path (gradient partitioning, optimizer, BN updates) is correct.

Measured on v5e (30 epochs, 4 classes): 42.5% -> 77.5%.

Run: python tools/learning_sanity.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avmoe_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from avmoe_tpu.config import TrainConfig, replace, tiny_ave_config
from avmoe_tpu.data.ave import SyntheticAVEDataset
from avmoe_tpu.data.loader import BatchLoader
from avmoe_tpu.models.ave import AVEModel, make_ave_loss_fn
from avmoe_tpu.train.state import create_train_state
from avmoe_tpu.train.steps import make_train_step


def main(epochs: int = 30, num_classes: int = 4) -> bool:
    cfg = replace(tiny_ave_config(), num_classes=num_classes)
    tcfg = TrainConfig(batch_size=4, accum_steps=1, lr=2e-3)
    ds = SyntheticAVEDataset(
        length=32, num_segments=cfg.num_segments, audio_len=cfg.audio_len,
        img_size=cfg.swin.img_size, num_classes=num_classes, learnable=True,
        sample_rate=cfg.htsat.frontend.sample_rate)
    model = AVEModel(cfg)
    loader = BatchLoader(ds, 4, shuffle=True, num_workers=2, seed=0)
    sample = ds[0]
    variables = jax.jit(lambda r, w, im: model.init(r, w, im, train=True))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "specaug": jax.random.PRNGKey(2)},
        jnp.asarray(sample["wave"][None]), jnp.asarray(sample["images"][None]))
    state = create_train_state(model, variables, tcfg, len(loader))
    step = make_train_step(make_ave_loss_fn(model, mixup_alpha=0.0))
    rng = jax.random.PRNGKey(0)
    accs = []
    for epoch in range(epochs):
        for batch in loader:
            rng, k = jax.random.split(rng)
            state, m = step(state, {k2: jnp.asarray(v) for k2, v in batch.items()}, k)
        accs.append(float(m["accuracy"]))
        if epoch % 5 == 0:
            print(f"epoch {epoch}: loss {float(m['loss']):.3f} acc {accs[-1]:.1f}")
    improved = np.mean(accs[-5:]) > np.mean(accs[:5]) + 10
    print("first-5 acc", np.mean(accs[:5]), "last-5 acc", np.mean(accs[-5:]),
          "->", "LEARNING" if improved else "NOT LEARNING")
    return improved


if __name__ == "__main__":
    assert main()
