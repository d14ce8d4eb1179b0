"""microGPT proving demo: 1-layer 4-head transformer LM matching the
reference's microgpt benchmark model (atlas-onnx-tracer/models/microgpt/
gen.py:175-180: vocab 32, n_embd 16, 4 heads, 1 layer, block 16).

Reference analogue: jolt-atlas-core/examples/microgpt.rs.
"""
import os
import subprocess
import sys

if __name__ == "__main__":
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "nanogpt_style.py")
    sys.exit(subprocess.call(
        [sys.executable, script, "--blocks", "1",
         "--dim", "16", "--seq", "16", "--vocab", "32", "--heads", "4"]
        + sys.argv[1:]))
