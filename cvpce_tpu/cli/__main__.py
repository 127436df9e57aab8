"""`python -m cvpce_tpu.cli` — same entry point as the `cvpce-tpu`
console script (pyproject [project.scripts])."""
from . import cli

if __name__ == "__main__":
    cli()
