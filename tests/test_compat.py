"""compat.COW drop-in entry point (reference src/csvw_tool.py:20-86):
build writes <file>-metadata.json, convert writes the chosen
serialization next to the input — including real TriG (not N-Quads in
a .trig file)."""

import os


class TestCOWCompat:
    def _csv(self, tmp_path):
        p = tmp_path / "people.csv"
        p.write_text("name,age\nalice,34\nbob,55\n", encoding="utf-8")
        return str(p)

    def test_build_then_convert_nquads(self, ray_session, tmp_path):
        from cow_ray.compat import COW

        src = self._csv(tmp_path)
        COW(mode="build", files=[src], base="https://example.com/id/")
        assert os.path.exists(src + "-metadata.json")
        COW(mode="convert", files=[src], output_format="nquads")
        nq = open(src + ".nq", encoding="utf-8").read()
        assert "alice" in nq
        # N-Quads lines end with a graph term + ' .'
        assert all(ln.endswith(" .") for ln in nq.splitlines() if ln.strip())

    def test_convert_trig_is_real_trig(self, ray_session, tmp_path):
        """output_format='trig' must serialize TriG graph blocks, not
        fall through to the N-Quads writer."""
        from cow_ray.compat import COW

        src = self._csv(tmp_path)
        COW(mode="build", files=[src], base="https://example.com/id/")
        COW(mode="convert", files=[src], output_format="trig")
        text = open(src + ".trig", encoding="utf-8").read()
        assert "{" in text and "}" in text  # graph blocks
        assert "@prefix" in text
        assert "alice" in text
