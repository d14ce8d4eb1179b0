"""miniGPT proving demo: 2-layer 8-head transformer LM matching the
reference's minigpt benchmark model (atlas-onnx-tracer/models/minigpt/
gen.py:154-159: vocab 1024, n_embd 32, 8 heads, 2 layers, block 32).

Reference analogue: jolt-atlas-core/examples/minigpt.rs.
"""
import os
import subprocess
import sys

if __name__ == "__main__":
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "nanogpt_style.py")
    sys.exit(subprocess.call(
        [sys.executable, script, "--blocks", "2",
         "--dim", "32", "--seq", "32", "--vocab", "1024", "--heads", "8"]
        + sys.argv[1:]))
