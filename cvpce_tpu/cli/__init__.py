"""cvpce-tpu command line interface.

Mirrors the reference CLI surface (cvpce/cli/__init__.py:15-35): subgroups
`datasets`, `gln`, `dihe`, `misc`, plus top-level evaluation commands.
"""
from __future__ import annotations

import click

from . import datasets as datasets_mod
from . import dihe as dihe_mod
from . import eval as eval_mod
from . import gln as gln_mod
from . import misc as misc_mod


@click.group()
def cli():
    """cvpce-tpu: TPU-native planogram compliance evaluation.

    \b
    Typical flow:
      gln train / gln eval      - product proposal detector (SKU-110K)
      dihe pretrain-gan / train - embedding encoder (Grocery Products)
      eval-planograms           - end-to-end compliance scoring
    """


cli.add_command(gln_mod.gln)
cli.add_command(dihe_mod.dihe)
cli.add_command(datasets_mod.datasets)
cli.add_command(misc_mod.misc)
cli.add_command(eval_mod.eval_product_detection)
cli.add_command(eval_mod.eval_planograms)
cli.add_command(eval_mod.rebuild_scene)
cli.add_command(eval_mod.plot_planogram_eval)


def main():
    cli()


if __name__ == "__main__":
    main()
