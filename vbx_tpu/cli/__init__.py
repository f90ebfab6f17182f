"""Command-line entry points (argument parity with the reference CLIs
VBx/vbhmm.py and VBx/predict.py, plus a dscore-equivalent scorer)."""
