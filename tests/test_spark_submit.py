"""North-rule packaging check: the pipeline ships via
`spark-submit --py-files document_ai_spark.zip scripts/run_extract.py`
and runs end-to-end (generate -> checkpointed extract -> range layout)."""
from __future__ import annotations

import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(),
                    reason="spark-submit not on this host")
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = tmp_path / "document_ai_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in sorted((REPO / "document_ai_spark").rglob("*.py")):
            z.write(f, f.relative_to(REPO))

    out = tmp_path / "out"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(zip_path),
         str(REPO / "scripts" / "run_extract.py"),
         "--generate", "300",
         "--input", str(tmp_path / "corpus"),
         "--output", str(out),
         "--buckets", "2", "--range-layout"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "300 documents extracted" in proc.stdout
    assert (out / "data").exists()
    assert (out / "by_doc_id").exists()
