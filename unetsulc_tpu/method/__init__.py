"""Method layer: the sulci-labelling method classes.

Rebuild of the reference's L4 layer: ``UnetPatternSulciLabelling`` base
(ref pattern_class.py:32) with training (ref training.py:33) and transfer
(ref transfer_learning/transfer_learning.py:27) subclasses — implemented as
the *intended* design (both methods inheriting the base, README.md:13), not
the reference's broken top-level import wiring (SURVEY.md §1).
"""

from unetsulc_tpu.method.base import SulciLabeller  # noqa: F401
from unetsulc_tpu.method.training import TrainingSulciLabeller  # noqa: F401
from unetsulc_tpu.method.transfer import TransferSulciLabeller  # noqa: F401

# Reference-style aliases (drop-in names)
UnetPatternSulciLabelling = SulciLabeller
UnetTrainingSulciLabelling = TrainingSulciLabeller
UnetTransferSulciLabelling = TransferSulciLabeller
