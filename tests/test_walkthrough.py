"""The reference tutorial flow runs end to end through the SQL shim
(examples/reference_walkthrough.py — the switcher's executable proof)."""

import json


def test_reference_walkthrough_end_to_end(spark, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.reference_walkthrough import run

    prompts, answers = run(spark, str(tmp_path))
    prows = prompts.collect()
    assert len(prows) == 3
    for r in prows:
        body = json.loads(r.prompt)
        assert body["prompt"] == r.content
        assert "products" in body
    arows = answers.collect()
    assert len(arows) == 3
    for r in arows:
        resp = json.loads(r.json_response)
        assert resp["role"] == "assistant"
        assert "template-llm" in resp["content"]
    # retrieval sanity: the trail-running question retrieves the
    # running-trail product in its top-3 (deterministic embedder)
    trail = next(r for r in prows if "trail" in r.content)
    assert "running trail" in json.loads(trail.prompt)["products"]
