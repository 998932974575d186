"""DataContext facade — the reference's primary entry point
(``great_expectations.get_context()``, ``util.py:1735-1824``;
``data_context/data_context/{abstract,ephemeral,file}_data_context.py``)
re-expressed Spark-first over this package's existing stores, planner,
checkpoint actions and Data Docs site builder.

The reference's DataContext is a large orchestration object wired
through a YAML project config and a store registry.  Here the same
user-facing verbs — suite CRUD, ``get_validator``, named checkpoints,
``run_checkpoint``, ``build_data_docs`` — compose the already-tested
pieces:

* suites        → :class:`checkpoint.suite_store.SuiteStore`
* validations   → :class:`checkpoint.store_backends.BackendValidationResultStore`
  (which also serves URN evaluation parameters, so chained-suite
  ``urn:great_expectations:validations:...`` references resolve exactly
  as in ``checkpoint/param_store.py``)
* data docs     → :class:`render.site.SiteBuilder`
* validation    → ONE shared :class:`plans.planner.SuiteValidator`
  (bundled single-pass aggregation; nothing here adds Spark jobs)

Two context flavors, as in the reference:

* ``EphemeralDataContext`` — everything in memory
  (``InMemoryResultBackend``); nothing touches disk until
  ``build_data_docs()`` renders into a temp dir.
* ``FileDataContext`` — the reference's on-disk project scaffold
  (``serializable_data_context.py:53,207-240``)::

      <project root>/great_expectations/
          great_expectations.yml
          expectations/                    # suite store
          checkpoints/                     # checkpoint configs (JSON)
          uncommitted/validations/         # validation-result store
          uncommitted/data_docs/local_site # browsable site

Usage (the reference's own quickstart, unchanged except the import)::

    import great_expectations_spark as gx

    context = gx.get_context()                       # ephemeral
    context = gx.get_context(project_root_dir=".")   # file-backed

    ds = context.sources.add_spark("my_ds", spark=spark)
    asset = ds.add_parquet_asset("events", "/data/events.parquet")

    validator = context.get_validator(
        asset=asset, expectation_suite_name="events.basic"
    )
    validator.expect_column_values_to_not_be_null("text")
    context.save_expectation_suite(validator.get_expectation_suite())

    checkpoint = context.add_checkpoint(
        name="nightly",
        validations=[{"asset": asset,
                      "expectation_suite_name": "events.basic"}],
    )
    result = context.run_checkpoint("nightly")
    assert result.success
    context.build_data_docs()
"""

from __future__ import annotations

import datetime
import json
import os
import tempfile
from typing import Any, Dict, List, Optional, Union

from pyspark.sql import DataFrame, SparkSession

from great_expectations_spark.checkpoint.store_backends import (
    BackendValidationResultStore,
    FilesystemResultBackend,
    InMemoryResultBackend,
    ResultStoreBackend,
)
from great_expectations_spark.checkpoint.suite_store import SuiteStore
from great_expectations_spark.core.results import (
    ExpectationSuiteValidationResult,
)
from great_expectations_spark.core.suite import (
    ExpectationConfiguration,
    ExpectationSuite,
)
from great_expectations_spark.core.validator_api import Validator
from great_expectations_spark.plans.planner import SuiteValidator
from great_expectations_spark.sources.fluent import DataAsset, Datasource
from great_expectations_spark.sources.readers import BatchSpec


def _default_run_id() -> str:
    # the reference's RunIdentifier default: UTC run time, filesystem-safe
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y%m%dT%H%M%S.%fZ"
    )


class CheckpointResult:
    """Aggregate of one checkpoint run (reference
    ``checkpoint/types/checkpoint_result.py`` CheckpointResult):
    per-validation suite results keyed ``<suite>@<asset>``, overall
    ``success`` = all validations passed."""

    def __init__(
        self,
        checkpoint_name: str,
        run_id: str,
        run_results: Dict[str, ExpectationSuiteValidationResult],
    ) -> None:
        self.checkpoint_name = checkpoint_name
        self.run_id = run_id
        self.run_results = run_results

    @property
    def success(self) -> bool:
        return all(r.success for r in self.run_results.values())

    def list_validation_results(
        self,
    ) -> List[ExpectationSuiteValidationResult]:
        return list(self.run_results.values())

    def to_json_dict(self) -> Dict[str, Any]:
        return {
            "checkpoint_name": self.checkpoint_name,
            "run_id": self.run_id,
            "success": self.success,
            "run_results": {
                k: r.to_json_dict() for k, r in self.run_results.items()
            },
        }

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"CheckpointResult(checkpoint={self.checkpoint_name!r}, "
            f"run_id={self.run_id!r}, success={self.success}, "
            f"validations={len(self.run_results)})"
        )


class Checkpoint:
    """Named, reusable bundle of (batch, suite) validations (reference
    ``checkpoint/checkpoint.py`` Checkpoint / SimpleCheckpoint).

    Each ``validations`` entry is a dict with one batch source —

    * ``"dataframe"``: a live DataFrame (runtime batch; in-session only,
      not persisted), or
    * ``"asset"``: a fluent :class:`DataAsset` (persisted by batch spec
      for file contexts), or
    * ``"datasource_name"`` + ``"data_asset_name"``: resolved against
      the context's registered datasources at run time

    — plus ``"expectation_suite_name"`` naming a stored suite.  ``run``
    validates every entry through the context's ONE shared bundled-agg
    engine, stores each result (which makes its metrics URN-addressable
    for downstream suites' evaluation parameters), updates Data Docs,
    and fires ``action_list`` per validation."""

    def __init__(
        self,
        name: str,
        context: "AbstractDataContext",
        validations: List[Dict[str, Any]],
        action_list: Optional[List[Any]] = None,
        result_format: Union[str, dict] = "SUMMARY",
    ) -> None:
        self.name = name
        self._context = context
        self.validations = list(validations)
        self.action_list = list(action_list or [])
        self.result_format = result_format

    # -- run ------------------------------------------------------------

    def _resolve_batch(self, v: Dict[str, Any]) -> tuple:
        """(DataFrame, asset_label, batch_meta) for one validation entry."""
        if v.get("dataframe") is not None:
            return v["dataframe"], v.get("data_asset_name", "runtime"), {}
        asset = v.get("asset")
        if asset is None and v.get("batch_spec") is not None:
            # file-context reload path: rebuild the asset from its spec
            spec = dict(v["batch_spec"])
            asset = DataAsset(
                name=spec.pop("asset_name", v.get("data_asset_name", "asset")),
                spec=BatchSpec(**spec),
                spark=self._context.spark,
            )
        if asset is None and v.get("datasource_name"):
            ds = self._context.datasources[v["datasource_name"]]
            asset = ds.get_asset(v["data_asset_name"])
        if asset is None:
            raise ValueError(
                "validation entry needs one of dataframe / asset / "
                "(datasource_name, data_asset_name): "
                f"{sorted(k for k in v if v[k] is not None)}"
            )
        return asset.build_batch(), asset.name, asset.batch_spec_meta()

    def run(
        self,
        run_id: Optional[str] = None,
        evaluation_parameters: Optional[Dict[str, Any]] = None,
        result_format: Union[str, dict, None] = None,
        validations: Optional[List[Dict[str, Any]]] = None,
    ) -> CheckpointResult:
        from great_expectations_spark.checkpoint.actions import (
            ActionContext,
            run_actions,
        )

        ctx = self._context
        run_id = run_id or _default_run_id()
        run_results: Dict[str, ExpectationSuiteValidationResult] = {}
        for v in validations if validations is not None else self.validations:
            df, asset_label, batch_meta = self._resolve_batch(v)
            suite_name = v["expectation_suite_name"]
            suite = ctx.get_expectation_suite(suite_name)
            result = ctx._engine.validate(
                df,
                suite,
                result_format=result_format or self.result_format,
                run_id=run_id,
                evaluation_parameters={
                    **(evaluation_parameters or {}),
                    **(v.get("evaluation_parameters") or {}),
                },
                batch_meta={**batch_meta, "checkpoint_name": self.name},
                parameter_store=ctx.validations_store,
            )
            ctx.validations_store.save(result, suite_name=suite_name)
            ctx._docs_add(result, suite_name, run_id, asset_label)
            if self.action_list:
                run_actions(
                    self.action_list,
                    ActionContext(
                        run_id=run_id,
                        suite_name=suite_name,
                        partition_column="asset",
                        partition_id=asset_label,
                        result=result,
                        entry_status="done" if result.success else "failed",
                    ),
                )
            run_results[f"{suite_name}@{asset_label}"] = result
        return CheckpointResult(self.name, run_id, run_results)

    # -- persistence ------------------------------------------------------

    def to_config(self) -> Dict[str, Any]:
        """JSON-serializable config (reference CheckpointConfig).  Runtime
        DataFrames can't persist; entries carrying one are marked and
        must be re-supplied via ``run(validations=...)`` after reload."""
        out_validations = []
        for v in self.validations:
            entry: Dict[str, Any] = {
                "expectation_suite_name": v["expectation_suite_name"]
            }
            asset = v.get("asset")
            if v.get("dataframe") is not None or (
                asset is not None and asset.spec.dataframe is not None
            ):
                entry["runtime"] = True
            elif asset is not None:
                spec = asset.spec
                entry["batch_spec"] = {
                    k: val
                    for k, val in (
                        ("asset_name", asset.name),
                        ("path", spec.path),
                        ("table", spec.table),
                        ("format", spec.format),
                        ("reader_options", spec.reader_options or None),
                    )
                    if val is not None
                }
            else:
                entry["datasource_name"] = v.get("datasource_name")
                entry["data_asset_name"] = v.get("data_asset_name")
            if v.get("evaluation_parameters"):
                entry["evaluation_parameters"] = v["evaluation_parameters"]
            out_validations.append(entry)
        return {
            "name": self.name,
            "class_name": "Checkpoint",
            "result_format": self.result_format,
            "validations": out_validations,
        }

    @classmethod
    def from_config(
        cls, context: "AbstractDataContext", config: Dict[str, Any]
    ) -> "Checkpoint":
        validations = []
        for entry in config.get("validations", []):
            if entry.get("runtime"):
                # placeholder: run() must be given a validations override
                validations.append(
                    {
                        "expectation_suite_name": entry[
                            "expectation_suite_name"
                        ],
                        "dataframe": None,
                        "runtime": True,
                    }
                )
            else:
                validations.append(dict(entry))
        return cls(
            name=config["name"],
            context=context,
            validations=validations,
            result_format=config.get("result_format", "SUMMARY"),
        )


class _Sources:
    """``context.sources`` facade (reference fluent
    ``datasources/sources.py`` _SourceFactories): registers named
    Spark datasources on the context."""

    def __init__(self, context: "AbstractDataContext") -> None:
        self._context = context

    def add_spark(
        self,
        name: str,
        spark: Optional[SparkSession] = None,
        spark_config: Optional[Dict[str, str]] = None,
    ) -> Datasource:
        if name in self._context.datasources:
            raise ValueError(f"datasource {name!r} already exists")
        ds = Datasource(
            name, spark or self._context.spark, spark_config=spark_config
        )
        self._context.datasources[name] = ds
        return ds

    def add_or_update_spark(
        self,
        name: str,
        spark: Optional[SparkSession] = None,
        spark_config: Optional[Dict[str, str]] = None,
    ) -> Datasource:
        self._context.datasources.pop(name, None)
        return self.add_spark(name, spark=spark, spark_config=spark_config)


class AbstractDataContext:
    """Shared verbs (reference ``abstract_data_context.py``); concrete
    contexts supply the stores and docs directory."""

    def __init__(
        self,
        suite_backend: ResultStoreBackend,
        validations_backend: ResultStoreBackend,
        spark: Optional[SparkSession] = None,
        engine: Optional[SuiteValidator] = None,
    ) -> None:
        self.suite_store = SuiteStore(suite_backend)
        self.validations_backend = validations_backend
        self.validations_store = BackendValidationResultStore(
            validations_backend
        )
        self.datasources: Dict[str, Datasource] = {}
        self.sources = _Sources(self)
        self._spark = spark
        self._engine = engine or SuiteValidator()
        self._checkpoints: Dict[str, Checkpoint] = {}
        self._site = None  # lazy SiteBuilder

    # -- spark ------------------------------------------------------------

    @property
    def spark(self) -> SparkSession:
        s = self._spark or SparkSession.getActiveSession()
        if s is None:
            raise RuntimeError(
                "no SparkSession: pass get_context(spark=...) or create "
                "one first"
            )
        return s

    # -- expectation suites ------------------------------------------------

    def add_or_update_expectation_suite(
        self,
        expectation_suite_name: Optional[str] = None,
        expectations: Optional[List[Any]] = None,
        evaluation_parameters: Optional[Dict[str, Any]] = None,
        meta: Optional[Dict[str, Any]] = None,
        suite: Optional[ExpectationSuite] = None,
    ) -> ExpectationSuite:
        if suite is None:
            if not expectation_suite_name:
                raise ValueError("expectation_suite_name or suite required")
            suite = ExpectationSuite(
                expectation_suite_name,
                expectations=[
                    e
                    if isinstance(e, ExpectationConfiguration)
                    else ExpectationConfiguration(
                        e["expectation_type"], e.get("kwargs", {})
                    )
                    for e in (expectations or [])
                ],
                evaluation_parameters=dict(evaluation_parameters or {}),
                meta=dict(meta or {}),
            )
        self.suite_store.save(suite)
        return suite

    # the reference's non-upserting add: refuse to clobber an existing name
    def add_expectation_suite(
        self, expectation_suite_name: str, **kwargs: Any
    ) -> ExpectationSuite:
        try:
            self.suite_store.load(expectation_suite_name)
        except KeyError:
            return self.add_or_update_expectation_suite(
                expectation_suite_name, **kwargs
            )
        raise ValueError(
            f"expectation suite {expectation_suite_name!r} already exists "
            "(use add_or_update_expectation_suite)"
        )

    def save_expectation_suite(self, suite: ExpectationSuite) -> str:
        return self.suite_store.save(suite)

    def get_expectation_suite(self, name: str) -> ExpectationSuite:
        return self.suite_store.load(name)

    def delete_expectation_suite(self, name: str) -> None:
        self.suite_store.delete(name)

    def list_expectation_suite_names(self) -> List[str]:
        return self.suite_store.list_suites()

    # -- validators ---------------------------------------------------------

    def get_validator(
        self,
        dataframe: Optional[DataFrame] = None,
        asset: Optional[DataAsset] = None,
        expectation_suite_name: Optional[str] = None,
        expectation_suite: Optional[ExpectationSuite] = None,
        result_format: Union[str, dict] = "BASIC",
    ) -> Validator:
        if dataframe is None:
            if asset is None:
                raise ValueError("pass dataframe= or asset=")
            dataframe = asset.build_batch()
        suite = expectation_suite
        if suite is None and expectation_suite_name:
            try:
                suite = self.get_expectation_suite(expectation_suite_name)
            except KeyError:
                # reference get_validator(create_expectation_suite=True)
                # convenience: a fresh named suite, saved on first
                # save_expectation_suite call
                suite = ExpectationSuite(expectation_suite_name)
        return Validator(
            dataframe,
            suite_name=expectation_suite_name or "default",
            result_format=result_format,
            engine=self._engine,
            suite=suite,
        )

    # -- checkpoints ---------------------------------------------------------

    def add_checkpoint(
        self,
        name: Optional[str] = None,
        validations: Optional[List[Dict[str, Any]]] = None,
        action_list: Optional[List[Any]] = None,
        result_format: Union[str, dict] = "SUMMARY",
        checkpoint: Optional[Checkpoint] = None,
    ) -> Checkpoint:
        if checkpoint is None:
            if not name:
                raise ValueError("name required")
            checkpoint = Checkpoint(
                name,
                self,
                validations or [],
                action_list=action_list,
                result_format=result_format,
            )
        self._checkpoints[checkpoint.name] = checkpoint
        self._persist_checkpoint(checkpoint)
        return checkpoint

    def get_checkpoint(self, name: str) -> Checkpoint:
        if name in self._checkpoints:
            return self._checkpoints[name]
        cp = self._load_checkpoint(name)
        if cp is None:
            raise KeyError(f"no checkpoint named {name!r}")
        self._checkpoints[name] = cp
        return cp

    def list_checkpoints(self) -> List[str]:
        return sorted(
            set(self._checkpoints) | set(self._stored_checkpoint_names())
        )

    def run_checkpoint(
        self,
        checkpoint_name: Optional[str] = None,
        checkpoint: Optional[Checkpoint] = None,
        **run_kwargs: Any,
    ) -> CheckpointResult:
        cp = checkpoint or self.get_checkpoint(checkpoint_name)
        return cp.run(**run_kwargs)

    # concrete contexts override the persistence hooks
    def _persist_checkpoint(self, checkpoint: Checkpoint) -> None:
        pass

    def _load_checkpoint(self, name: str) -> Optional[Checkpoint]:
        return None

    def _stored_checkpoint_names(self) -> List[str]:
        return []

    # -- data docs -----------------------------------------------------------

    def _docs_dir(self) -> str:
        raise NotImplementedError

    def _site_builder(self):
        if self._site is None:
            from great_expectations_spark.render.site import SiteBuilder

            self._site = SiteBuilder(self._docs_dir())
        return self._site

    def _docs_add(
        self,
        result: ExpectationSuiteValidationResult,
        suite_name: str,
        run_id: str,
        asset_label: str,
    ) -> None:
        self._site_builder().add_validation_result(
            result,
            suite_name=suite_name,
            run_id=run_id,
            partition_id=f"asset={asset_label}",
        )

    def build_data_docs(self) -> Dict[str, str]:
        """(Re)render the full site from every stored validation result
        (reference ``build_data_docs``, ``abstract_data_context.py:5216``).
        Incremental updates already happen per checkpoint run; this is
        the rebuild-the-world verb."""
        site = self._site_builder()
        iter_records = getattr(self.validations_backend, "iter_records", None)
        if iter_records is not None:
            for key, run_id, payload in iter_records():
                if key.startswith("suite::") or key.startswith("suite__"):
                    continue  # shared-backend suite records are not results
                try:
                    data = json.loads(payload)
                except ValueError:
                    continue
                if "results" not in data:
                    continue
                site.add_validation_result(
                    data, suite_name=key, run_id=run_id
                )
        return {"local_site": os.path.join(site.directory, "index.html")}

    def open_data_docs(self) -> str:
        """Path of the site index (no browser launch in headless runs)."""
        return os.path.join(self._site_builder().directory, "index.html")

    # -- run comparison --------------------------------------------------

    def compare_runs(
        self,
        suite_name: str,
        run_before: Optional[str] = None,
        run_after: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Per-expectation regression diff between two stored runs of a
        suite (``checkpoint/compare.py``).  Defaults to the two most
        recent runs (run ids are UTC timestamps, so store order is run
        order)."""
        from great_expectations_spark.checkpoint.compare import (
            compare_validation_results,
        )

        iter_records = getattr(self.validations_backend, "iter_records", None)
        if iter_records is None:
            raise TypeError(
                "validations backend has no run history iteration"
            )
        runs = [
            (run_id, payload)
            for key, run_id, payload in iter_records()
            if key == suite_name
        ]
        if not runs:
            raise KeyError(f"no stored runs for suite {suite_name!r}")
        by_id = dict(runs)
        if run_before is None or run_after is None:
            if len(runs) < 2:
                raise ValueError(
                    f"suite {suite_name!r} has only {len(runs)} stored "
                    "run(s); pass run_before/run_after explicitly"
                )
            run_before = run_before or runs[-2][0]
            run_after = run_after or runs[-1][0]
        return compare_validation_results(
            json.loads(by_id[run_before]), json.loads(by_id[run_after])
        )


class EphemeralDataContext(AbstractDataContext):
    """All-in-memory context (reference ``ephemeral_data_context.py``)."""

    def __init__(
        self,
        spark: Optional[SparkSession] = None,
        engine: Optional[SuiteValidator] = None,
    ) -> None:
        super().__init__(
            suite_backend=InMemoryResultBackend(),
            validations_backend=InMemoryResultBackend(),
            spark=spark,
            engine=engine,
        )
        self._tmp_docs: Optional[str] = None

    def _docs_dir(self) -> str:
        if self._tmp_docs is None:
            self._tmp_docs = tempfile.mkdtemp(prefix="gx_spark_docs_")
        return self._tmp_docs

    def convert_to_file_context(
        self, project_root_dir: str
    ) -> "FileDataContext":
        """Persist this in-memory context as a file-backed project
        (reference ``EphemeralDataContext.convert_to_file_context``):
        suites, the full validation-run history, and checkpoint configs
        carry over; datasources stay session objects on the returned
        context."""
        ctx = FileDataContext.create(project_root_dir, spark=self._spark)
        # suite records keep their version history via the namespaced
        # keys; everything else in the backend is a validation run
        for key, run_id, payload in self.suite_store.backend.iter_records():
            ctx.suite_store.backend.append(key, run_id, payload)
        for key, run_id, payload in self.validations_backend.iter_records():
            ctx.validations_backend.append(key, run_id, payload)
        ctx.datasources.update(self.datasources)
        for checkpoint in self._checkpoints.values():
            ctx.add_checkpoint(
                checkpoint=Checkpoint(
                    checkpoint.name,
                    ctx,
                    checkpoint.validations,
                    action_list=checkpoint.action_list,
                    result_format=checkpoint.result_format,
                )
            )
        return ctx


_PROJECT_YML = """\
# great_expectations_spark project config
# (reference: great_expectations.yml, config_version 3)
config_version: 3.0
engine: great_expectations_spark
stores:
  expectations_store:
    class_name: SuiteStore
    backend: FilesystemResultBackend
    base_directory: expectations/
  validations_store:
    class_name: BackendValidationResultStore
    backend: FilesystemResultBackend
    base_directory: uncommitted/validations/
  checkpoint_store:
    class_name: Checkpoint
    base_directory: checkpoints/
data_docs_sites:
  local_site:
    base_directory: uncommitted/data_docs/local_site/
"""


def _read_project_config(path: str) -> Dict[str, str]:
    """Extract the ``base_directory`` overrides from the project yml.

    A purpose-built reader for the exact shape this package writes (and
    the reference's `stores:` / `data_docs_sites:` blocks): two-space
    indentation, ``key: value`` leaves.  Returns
    ``{store_name: base_directory}`` — anything else in the file is
    ignored, so hand-edited configs with extra keys keep working.  No
    YAML dependency (none is vendored here)."""
    out: Dict[str, str] = {}
    if not os.path.exists(path):
        return out
    section = None  # current top-level block
    entry = None  # current store/site name
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.rstrip("\n")
            stripped = line.split("#", 1)[0].rstrip()
            if not stripped.strip():
                continue
            indent = len(stripped) - len(stripped.lstrip())
            key, _, value = stripped.strip().partition(":")
            value = value.strip().strip("'\"")
            if indent == 0:
                section = key if not value else None
                entry = None
            elif section in ("stores", "data_docs_sites"):
                if indent == 2 and not value:
                    entry = key
                elif indent >= 4 and key == "base_directory" and entry:
                    out[entry] = value
    return out


class FileDataContext(AbstractDataContext):
    """On-disk project context (reference ``file_data_context.py`` +
    ``serializable_data_context.py:207-240`` scaffold).  Suites,
    validation results, checkpoint configs and the Data Docs site all
    live under ``<root>/great_expectations/`` and survive across
    sessions.  ``base_directory`` entries in ``great_expectations.yml``
    relocate each store (relative paths resolve against the context
    root, as in the reference)."""

    GX_DIR = "great_expectations"
    GX_YML = "great_expectations.yml"

    def __init__(
        self,
        context_root_dir: str,
        spark: Optional[SparkSession] = None,
        engine: Optional[SuiteValidator] = None,
    ) -> None:
        self.root_directory = os.path.abspath(context_root_dir)
        cfg = _read_project_config(
            os.path.join(self.root_directory, self.GX_YML)
        )

        def _dir(store_name: str, default: str) -> str:
            base = cfg.get(store_name, default)
            return (
                base
                if os.path.isabs(base)
                else os.path.join(self.root_directory, base)
            )

        expectations_dir = _dir("expectations_store", "expectations")
        validations_dir = _dir(
            "validations_store", os.path.join("uncommitted", "validations")
        )
        self.checkpoints_directory = _dir("checkpoint_store", "checkpoints")
        self.data_docs_directory = _dir(
            "local_site",
            os.path.join("uncommitted", "data_docs", "local_site"),
        )
        for d in (
            expectations_dir,
            validations_dir,
            self.checkpoints_directory,
            self.data_docs_directory,
        ):
            os.makedirs(d, exist_ok=True)
        yml = os.path.join(self.root_directory, self.GX_YML)
        if not os.path.exists(yml):
            with open(yml, "w", encoding="utf-8") as f:
                f.write(_PROJECT_YML)
        super().__init__(
            suite_backend=FilesystemResultBackend(expectations_dir),
            validations_backend=FilesystemResultBackend(validations_dir),
            spark=spark,
            engine=engine,
        )

    @classmethod
    def create(
        cls, project_root_dir: str, spark: Optional[SparkSession] = None
    ) -> "FileDataContext":
        return cls(
            os.path.join(project_root_dir, cls.GX_DIR), spark=spark
        )

    # -- checkpoint persistence ------------------------------------------

    def _checkpoint_path(self, name: str) -> str:
        from great_expectations_spark.checkpoint.param_store import _safe

        return os.path.join(self.checkpoints_directory, f"{_safe(name)}.json")

    def _persist_checkpoint(self, checkpoint: Checkpoint) -> None:
        from great_expectations_spark.checkpoint.param_store import (
            ValidationResultStore,
        )

        ValidationResultStore._atomic_write(
            self._checkpoint_path(checkpoint.name),
            json.dumps(checkpoint.to_config(), indent=1, sort_keys=True),
        )

    def _load_checkpoint(self, name: str) -> Optional[Checkpoint]:
        path = self._checkpoint_path(name)
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as f:
            return Checkpoint.from_config(self, json.load(f))

    def _stored_checkpoint_names(self) -> List[str]:
        return [
            f[: -len(".json")]
            for f in os.listdir(self.checkpoints_directory)
            if f.endswith(".json")
        ]

    def _docs_dir(self) -> str:
        return self.data_docs_directory


def get_context(
    project_root_dir: Optional[str] = None,
    context_root_dir: Optional[str] = None,
    mode: Optional[str] = None,
    spark: Optional[SparkSession] = None,
) -> AbstractDataContext:
    """The reference's ``great_expectations.get_context()``
    (``util.py:1735-1824``): no directory → ephemeral in-memory context;
    ``project_root_dir`` → file context scaffolded at
    ``<project_root_dir>/great_expectations/``; ``context_root_dir``
    names the gx directory itself.  ``mode`` forces ``"ephemeral"`` or
    ``"file"`` (file mode without a directory scaffolds in the cwd)."""
    if mode not in (None, "ephemeral", "file"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "ephemeral":
        return EphemeralDataContext(spark=spark)
    if context_root_dir:
        return FileDataContext(context_root_dir, spark=spark)
    if project_root_dir:
        return FileDataContext.create(project_root_dir, spark=spark)
    if mode == "file":
        return FileDataContext.create(os.getcwd(), spark=spark)
    return EphemeralDataContext(spark=spark)
