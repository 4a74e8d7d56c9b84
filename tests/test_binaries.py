"""`get-binaries` engine bootstrap: URL selection, install, discovery.

The reference vendors mmseqs/foldcomp per-arch at build time
(reference setup.py:66-135); here the same builds install on demand and
binary discovery picks them up without configuration.
"""

import io
import os
import stat
import tarfile

import pytest

from metagenomic_deepfri_tpu.search.binaries import (FOLDCOMP_BINARIES,
                                                     MMSEQS_BINARIES,
                                                     _extract_binary,
                                                     fetch_binaries,
                                                     select_foldcomp_url,
                                                     select_mmseqs_url,
                                                     tool_install_hint,
                                                     tools_dir)


class TestUrlSelection:
    def test_mmseqs_x86_features(self):
        assert select_mmseqs_url("x86_64", "Linux", {"avx2", "sse4_1"}) \
            == MMSEQS_BINARIES["avx2"]
        assert select_mmseqs_url("x86_64", "Linux", {"sse4_1"}) \
            == MMSEQS_BINARIES["sse41"]
        assert select_mmseqs_url("x86_64", "Linux", set()) \
            == MMSEQS_BINARIES["sse2"]

    def test_mmseqs_non_x86(self):
        assert select_mmseqs_url("aarch64", "Linux") \
            == MMSEQS_BINARIES["aarch64"]
        assert select_mmseqs_url("ppc64le", "Linux") \
            == MMSEQS_BINARIES["ppc"]
        assert select_mmseqs_url("arm64", "Darwin") \
            == MMSEQS_BINARIES["macos"]

    def test_foldcomp(self):
        assert select_foldcomp_url("x86_64", "Linux") \
            == FOLDCOMP_BINARIES["linux"]
        assert select_foldcomp_url("aarch64", "Linux") \
            == FOLDCOMP_BINARIES["aarch64"]
        assert select_foldcomp_url("arm64", "Darwin") \
            == FOLDCOMP_BINARIES["macos"]

    def test_host_selection_returns_some_url(self):
        assert select_mmseqs_url().startswith("https://mmseqs.com/")
        assert select_foldcomp_url().startswith("https://mmseqs.com/")


def _make_tarball(path, member_path, content=b"#!/bin/sh\necho ok\n"):
    with tarfile.open(path, "w:gz") as tar:
        info = tarfile.TarInfo(member_path)
        info.size = len(content)
        tar.addfile(info, io.BytesIO(content))


class TestExtract:
    def test_extracts_and_marks_executable(self, tmp_path):
        tar = tmp_path / "t.tar.gz"
        _make_tarball(tar, "mmseqs/bin/mmseqs")
        out = _extract_binary(tar, "mmseqs", tmp_path)
        assert out.name == "mmseqs"
        assert out.stat().st_mode & stat.S_IXUSR
        assert out.read_bytes().startswith(b"#!/bin/sh")

    def test_missing_member_is_loud(self, tmp_path):
        tar = tmp_path / "t.tar.gz"
        _make_tarball(tar, "something/else")
        with pytest.raises(RuntimeError, match="does not contain"):
            _extract_binary(tar, "foldcomp", tmp_path)


class TestDiscovery:
    def test_tools_dir_env_override(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MDEEPFRI_TOOLS_DIR", str(tmp_path))
        assert tools_dir() == tmp_path

    def test_fetched_binary_discovered(self, tmp_path, monkeypatch):
        """A binary installed by get-binaries is found with NO PATH or env
        configuration — the gap the reference closes by vendoring."""
        from metagenomic_deepfri_tpu.search import mmseqs as m

        monkeypatch.setenv("MDEEPFRI_TOOLS_DIR", str(tmp_path))
        monkeypatch.delenv("MDEEPFRI_FOLDCOMP_PATH", raising=False)
        monkeypatch.setenv("PATH", str(tmp_path / "nowhere"))
        assert m.foldcomp_path() is None
        fc = tmp_path / "foldcomp"
        fc.write_text("#!/bin/sh\n")
        fc.chmod(fc.stat().st_mode | stat.S_IXUSR)
        assert m.foldcomp_path() == str(fc)
        # env override still wins over the tools dir
        override = tmp_path / "custom_fc"
        override.write_text("#!/bin/sh\n")
        monkeypatch.setenv("MDEEPFRI_FOLDCOMP_PATH", str(override))
        assert m.foldcomp_path() == str(override)

    def test_vendored_binary_discovered(self, tmp_path, monkeypatch):
        """A wheel-vendored binary (MDEEPFRI_VENDOR_BINARIES=1 build) is
        found before the tools dir and PATH — reference-style vendoring."""
        from metagenomic_deepfri_tpu.search import binaries as b
        from metagenomic_deepfri_tpu.search import mmseqs as m

        vendor = tmp_path / "_vendor"
        vendor.mkdir()
        monkeypatch.setattr(b, "vendor_dir", lambda: vendor)
        monkeypatch.setenv("MDEEPFRI_TOOLS_DIR", str(tmp_path / "none"))
        monkeypatch.delenv("MDEEPFRI_MMSEQS_PATH", raising=False)
        monkeypatch.setenv("PATH", str(tmp_path / "nowhere"))
        assert m.mmseqs_path() is None
        mm = vendor / "mmseqs"
        mm.write_text("#!/bin/sh\n")
        mm.chmod(mm.stat().st_mode | stat.S_IXUSR)
        assert m.mmseqs_path() == str(mm)

    def test_install_hint_mentions_verb(self):
        hint = tool_install_hint("foldcomp")
        assert "get-binaries" in hint
        assert "MDEEPFRI_FOLDCOMP_PATH" in hint


class TestFetchOffline:
    def test_offline_error_is_actionable(self, tmp_path, monkeypatch):
        """Without egress the failure names the URL (documented blocker
        semantics, same as get-models)."""
        if os.environ.get("MDEEPFRI_ALLOW_NETWORK"):
            pytest.skip("network available")
        with pytest.raises((RuntimeError, Exception)) as exc:
            fetch_binaries(tmp_path, ["foldcomp"])
        assert "foldcomp" in str(exc.value)

    def test_unknown_tool_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="unknown tool"):
            fetch_binaries(tmp_path, ["netcat"])
