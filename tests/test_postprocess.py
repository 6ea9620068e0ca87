"""post_process_data (reference utilities.py:229-283) with mocked
downloads: top-k selection, best_scores.txt format, download ordering
and failure tolerance — no network access."""

import os
import urllib.request


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _paths(tmp_path):
    return {
        "real_captions_path": str(tmp_path / "real.txt"),
        "generated_captions_path": str(tmp_path / "gen.txt"),
        "image_urls_path": str(tmp_path / "urls.txt"),
        "best_score_file_path": str(tmp_path / "best_scores.txt"),
        "best_score_images_path": str(tmp_path / "best_images"),
    }


def test_post_process_selects_scores_and_downloads_in_order(tmp_path, monkeypatch):
    from image_captioning_through_rl_tpu.metrics.postprocess import post_process_data

    paths = _paths(tmp_path)
    # pair 2 is a perfect match (best), pair 0 partial, others junk
    _write(paths["real_captions_path"], [
        "a dog runs fast", "x y z", "a cat sits on the mat", "p q r",
    ])
    _write(paths["generated_captions_path"], [
        "a dog runs", "completely different words here", "a cat sits on the mat", "other stuff",
    ])
    _write(paths["image_urls_path"], [f"http://img/{i}.jpg" for i in range(4)])

    calls = []
    monkeypatch.setattr(
        urllib.request, "urlretrieve", lambda url, fn: calls.append((url, fn))
    )
    post_process_data(paths, top_item_count=2)

    with open(paths["best_score_file_path"]) as f:
        lines = f.read().splitlines()
    assert len(lines) == 2
    # best first: the identical pair (index 2 -> item_index[3])
    assert lines[0].startswith("item_index[3] ")
    assert "real_cap:[a cat sits on the mat]" in lines[0]
    assert "generated_cap:[a cat sits on the mat]" in lines[0]
    assert lines[1].startswith("item_index[1] ")  # partial match second

    # downloads follow the score ranking, named item_index.jpg
    assert [u for u, _ in calls] == ["http://img/2.jpg", "http://img/0.jpg"]
    assert [os.path.basename(fn) for _, fn in calls] == ["3.jpg", "1.jpg"]
    assert os.path.isdir(paths["best_score_images_path"])


def test_post_process_tolerates_download_failures(tmp_path, monkeypatch):
    from image_captioning_through_rl_tpu.metrics.postprocess import post_process_data

    paths = _paths(tmp_path)
    _write(paths["real_captions_path"], ["a b c", "d e f"])
    _write(paths["generated_captions_path"], ["a b c", "d e f"])
    _write(paths["image_urls_path"], ["http://img/0.jpg", "http://img/1.jpg"])

    def boom(url, fn):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlretrieve", boom)
    post_process_data(paths, top_item_count=2)  # must not raise (utilities.py:272-278)
    with open(paths["best_score_file_path"]) as f:
        assert len(f.read().splitlines()) == 2  # scores still written
