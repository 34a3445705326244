"""Mean-teacher EMA as a pure pytree map.

Twin of reference utils.py:9-25 (OldWeightEMA): the teacher's *parameters*
are an exponential moving average of the student's; BatchNorm statistics are
NOT averaged (the reference EMA iterates ``.parameters()`` only — the
teacher's running stats evolve through its own train-mode forwards). The
init copies student params into the teacher.

lib/models/ema.py (ModelEMA, unused upstream) is also covered: it EMAs the
``params`` collection and copies every other collection (``batch_stats``)
verbatim from the incoming student — matching the reference's
``esd[k].copy_(msd[j])`` buffer handling.
"""

from __future__ import annotations

import jax


def ema_init(student_params):
    """Teacher init = copy of student params (OldWeightEMA.__init__)."""
    return jax.tree_util.tree_map(lambda p: p, student_params)


def ema_update(teacher_params, student_params, alpha: float = 0.999):
    """teacher <- alpha * teacher + (1 - alpha) * student (OldWeightEMA.step)."""
    return jax.tree_util.tree_map(
        lambda t, s: alpha * t + (1.0 - alpha) * s, teacher_params, student_params
    )


class OldWeightEMA:
    """Stateful wrapper mirroring utils.py:9-25 for API parity.

    Holds the teacher pytree and updates it in place-style from a student
    getter; the functional ``ema_update`` is the idiomatic path.
    """

    def __init__(self, teacher_params, student_params, alpha: float = 0.999):
        self.params = ema_init(student_params)
        self.alpha = alpha

    def step(self, student_params):
        self.params = ema_update(self.params, student_params, self.alpha)
        return self.params


class ModelEMA:
    """Deepcopy-style EMA (lib/models/ema.py:6-44, unused upstream): averages
    parameters; buffers (batch statistics) are copied verbatim from the
    student, matching the reference's ``esd[k].copy_(msd[j])``."""

    def __init__(self, variables, decay: float = 0.9999):
        self.variables = jax.tree_util.tree_map(lambda x: x, variables)
        self.decay = decay

    def update(self, variables):
        new = dict(variables)  # non-param collections: copy from student
        new["params"] = jax.tree_util.tree_map(
            lambda e, m: self.decay * e + (1.0 - self.decay) * m,
            self.variables["params"], variables["params"])
        self.variables = new
        return self.variables
