"""Cross-process determinism: the data pipeline must produce identical id
assignments, triple orderings and literal lists regardless of Python hash
randomization (the reference iterates raw sets — base/read.py:75-84 — so its
runs are not reproducible; ours must be)."""
import subprocess
import sys

import pytest

_DIGEST_SCRIPT = r"""
import hashlib, sys
from multike_tpu.data import synthetic
from multike_tpu.data.kg import read_kgs_from_folder

folder = sys.argv[1]
kgs = read_kgs_from_folder(folder, "631/", "swapping", False)
h = hashlib.sha256()
for pair in sorted(kgs.kg1.entities_id_dict.items()):
    h.update(repr(pair).encode())
for pair in sorted(kgs.kg2.entities_id_dict.items()):
    h.update(repr(pair).encode())
h.update(repr(kgs.kg1.relation_triples_list[:50]).encode())
h.update(repr(kgs.kg2.attribute_triples_list[:50]).encode())
h.update(repr(kgs.train_links[:50]).encode())
print(h.hexdigest())
"""


@pytest.mark.slow
def test_pipeline_hash_seed_invariant(tiny_dataset):
    digests = set()
    for hash_seed in ("1", "2", "3"):
        out = subprocess.run(
            [sys.executable, "-c", _DIGEST_SCRIPT, tiny_dataset],
            capture_output=True, text=True, timeout=300,
            env={"PYTHONHASHSEED": hash_seed, "PATH": "/usr/bin:/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"},
            cwd="/root/repo")
        assert out.returncode == 0, out.stderr
        digests.add(out.stdout.strip())
    assert len(digests) == 1, digests
