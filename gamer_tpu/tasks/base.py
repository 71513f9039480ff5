"""Task base class + shared CLI argument groups.

Mirrors the reference's task surface (ref: SeqRec/tasks/base.py:8-42, argument
groups in SeqRec/utils/parse.py:10-58) so scripts written against the reference
CLI translate directly. Argument capture for the metric stream replaces the
metaclass/log_arguments machinery (ref utils/func_util.py:9-44) with an explicit
`param_dict` recorded at invoke time.
"""

from __future__ import annotations

import argparse
from typing import Any

from gamer_tpu.core.logging import get_logger, setup_logging

logger = get_logger("tasks")


class Task:
    """Subclass, set `name`, implement `add_args` + `run`."""

    name: str = ""
    help: str = ""

    @classmethod
    def add_parser(cls, sub_parsers) -> argparse.ArgumentParser:
        parser = sub_parsers.add_parser(cls.name, help=cls.help or cls.__doc__)
        cls.add_args(parser)
        return parser

    @classmethod
    def add_args(cls, parser: argparse.ArgumentParser) -> None:
        raise NotImplementedError

    def invoke(self, **args: Any) -> Any:
        setup_logging(task=self.name)
        self.param_dict = {k: v for k, v in args.items() if not k.startswith("_")}
        logger.info("task %s args: %s", self.name, self.param_dict)
        return self.run(**args)

    def run(self, **args: Any) -> Any:
        raise NotImplementedError


def add_global_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """ref utils/parse.py parse_global_args."""
    g = parser.add_argument_group("global")
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--backbone", type=str, default="Qwen3Multi")
    g.add_argument("--base_model", type=str, default=None,
                   help="model config dir (JSON); defaults to built-in preset")
    g.add_argument("--output_dir", type=str, default="./checkpoint")
    return parser


def add_dataset_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """ref utils/parse.py parse_dataset_args."""
    g = parser.add_argument_group("dataset")
    g.add_argument("--data_path", type=str, default="./data")
    g.add_argument("--dataset", type=str, default="Toy")
    g.add_argument("--tasks", type=str, default="smb_explicit_decoder_4")
    g.add_argument("--index_file", type=str, default=".index.json")
    g.add_argument("--max_his_len", type=int, default=20)
    return parser
