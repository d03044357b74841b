"""Task expanders — the ``task_expanders::Expander`` extension surface.

The reference runs a list of expanders per parsed document
(main/src/task_expanders.rs:5-10); each pushes Links into the job context
(``ctx.push_links``) and the scheduling batch is the concatenation in
expander order (main/src/task_scheduler.rs:82-86). Built-ins:

- ``FollowLinks(link_target)``  → every <a href>  (select_task_expanders.rs:37-51)
- ``LoadImages(link_target)``   → every <img src> (select_task_expanders.rs:79-93)

Here an expander is any PICKLABLE callable ``expander(doc, task) -> list[dict]``:

- ``doc``: the pinned extractor's output (functions/extract.py) —
  ``{"title", "text", "links": [{href, rel, alt, text, pos}], "images": [...]}``
- ``task``: ``{"url", "depth"}`` of the page being expanded
- returns raw link dicts ``{href, rel?, alt?, text?, target?}`` — the engine
  canonicalizes each href against the page url, drops unparseable ones, and
  assigns batch positions in emission order (exactly ctx.push_links order).

``target`` defaults to "Follow"; use "Load" for fetch-only resources (the
LoadImages pattern), "Head"/"HeadLoad"/"JustResolveDNS" for reduced pipelines
(types.rs:166-173). Both the Spark engine and the reference simulator run the
same expander list, so parity tests cover custom expanders too.
"""

from __future__ import annotations


def follow_links(doc: dict, task: dict) -> list[dict]:
    """Built-in FollowLinks: <a href> → Follow tasks."""
    return [dict(link, target="Follow") for link in doc["links"]]


def load_images(doc: dict, task: dict) -> list[dict]:
    """Built-in LoadImages: <img src> → Load tasks (fetched, not parsed)."""
    return [dict(link, target="Load") for link in doc["images"]]


def follow_links_target(target: str):
    """FollowLinks with an explicit LinkTarget (reference FollowLinks::new)."""

    def expander(doc: dict, task: dict) -> list[dict]:
        return [dict(link, target=target) for link in doc["links"]]

    expander.__name__ = f"follow_links_{target}"
    return expander


DEFAULT_EXPANDERS = (follow_links,)
