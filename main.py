#!/usr/bin/env python
"""Entry point. Back-compatible with the reference's CLI surface
(`python main.py [--precompute]`, reference main.py:6-26) plus subcommands
precompute | train | predict | e2e."""
from tpu_breath.cli import main

if __name__ == "__main__":
    main()
