"""Task registry. Importing this package registers every task
(parity with the reference's 11 pipelines, SURVEY.md section 2.2)."""

from gamer_tpu.core.registry import TASKS
from gamer_tpu.tasks import train_smb_decoder  # noqa: F401
from gamer_tpu.tasks import test_smb_decoder  # noqa: F401
from gamer_tpu.tasks import test_smb_rule  # noqa: F401
from gamer_tpu.tasks import rqvae  # noqa: F401
from gamer_tpu.tasks import tokenize  # noqa: F401
from gamer_tpu.tasks import train_decoder  # noqa: F401
from gamer_tpu.tasks import test_decoder  # noqa: F401
from gamer_tpu.tasks import train_mb_decoder  # noqa: F401
from gamer_tpu.tasks import test_mb_decoder  # noqa: F401
from gamer_tpu.tasks import train_smb_rec  # noqa: F401
from gamer_tpu.tasks import semantic_emb  # noqa: F401

task_list = dict(TASKS)

__all__ = ["TASKS", "task_list"]
