#!/usr/bin/env python
"""Alias entry point.

The reference README (README.md:29) advertises `python work.py ...` but
ships no work.py; the real entry is train.py. This alias makes the
advertised command work.
"""

from train import main

if __name__ == "__main__":
    main()
