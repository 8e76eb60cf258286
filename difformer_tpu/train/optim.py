"""Optimizers with PyTorch-parity semantics.

All four reference trainers use ``torch.optim.Adam(weight_decay=wd)``
(e.g. ``node classification/main.py:111``) — that is **coupled** L2 (decay
added to the gradient *before* the moment updates), not decoupled AdamW;
optax's ``adamw`` would differ (SURVEY.md §7.1 item 5). ``torch_adam``
reproduces torch exactly: eps outside the sqrt, decay-into-gradient.
"""

from __future__ import annotations

import optax


def torch_adam(learning_rate, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-8):
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
    txs.append(optax.scale(-learning_rate))
    return optax.chain(*txs)
