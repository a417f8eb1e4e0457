"""Doc-sync: the README quick-start block must run as written."""

import re
import pathlib

import pytest


@pytest.mark.slow
def test_readme_quickstart_runs():
    readme = pathlib.Path(__file__).parent.parent / "README.md"
    blocks = re.findall(r"```python\n(.*?)```", readme.read_text(), re.S)
    assert blocks, "README quick-start python block not found"
    code = blocks[0]
    # run the block as written, with the step count reduced so the
    # doc-sync check stays minutes-scale on CPU
    code = code.replace("number_of_steps=10_000", "number_of_steps=500")
    assert "number_of_steps=500" in code
    ns = {}
    exec(compile(code, "README.md", "exec"), ns)
    state = ns["state"]
    # the run returned an advanced sampler state with finite coordinates
    import numpy as np
    x = np.asarray(state.positions)
    assert x.shape[-1] == 3 and np.all(np.isfinite(x))
