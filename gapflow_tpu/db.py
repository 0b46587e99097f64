"""Training database for the GP surrogates.

Holds (Xtrain, Ytrain, Yerr) as JAX arrays with max-abs normalization,
samples initial training points around the current field state
(random / Latin hypercube / Sobol), persists every MD run as a FAIR
dataset on disk, and reloads existing datasets on construction.

Parity: reference GaPFlow/db.py:46-455 (13-entry observation vector
[p, tau_bottom(6 Voigt), tau_top(6 Voigt)]; feature vector
[rho, jx, jy, h, dh/dx, dh/dy, extra...]).
"""

import os

import numpy as np
import yaml as _yaml
import jax.numpy as jnp
import jax.random as jr
from scipy.stats import qmc

from . import datasets as dt
from .utils import echo


class Database:
    """Container and manager for GP training data with an attached MD runner."""

    def __init__(self, md, db, num_extra_features=1):
        self._md = md
        self._db = db
        self._num_features = 6 + num_extra_features
        self._output_path = None

        training_path = db.get("dtool_path")
        if training_path is not None:
            self._temporary_training_path = False
            self.set_training_path(training_path)
            readme_list = self.get_readme_list_local()
        else:
            self._temporary_training_path = True
            self.set_training_path("/tmp/")
            readme_list = []

        if readme_list:
            Xtrain = jnp.array([rm["X"] for rm in readme_list])
            Ytrain = jnp.array([rm["Y"] for rm in readme_list])
            Yerr = jnp.array([rm["Yerr"] for rm in readme_list])
        else:
            Xtrain = jnp.empty((0, self.num_features))
            Ytrain = jnp.empty((0, 13))
            Yerr = jnp.empty((0, 13))

        self._Xtrain = Xtrain
        self._Ytrain = Ytrain
        self._Ytrain_err = Yerr

        if self.size == 0:
            self._X_scale = jnp.ones((self.num_features,))
            self._Y_scale = jnp.ones((13,))
        else:
            self._X_scale = self._normalizer(self._Xtrain)
            self._Y_scale = self._normalizer(self._Ytrain)

    # -- properties ---------------------------------------------------------
    @property
    def config(self):
        return self._db

    @property
    def md_config(self):
        return self._md.params

    @property
    def Xtrain(self):
        return self._Xtrain / self.X_scale

    @property
    def Ytrain(self):
        return self._Ytrain / self.Y_scale

    @property
    def Ytrain_err(self):
        return self._Ytrain_err / self.Y_scale

    @property
    def size(self):
        return self._Xtrain.shape[0]

    @property
    def X_scale(self):
        return self._X_scale

    @property
    def Y_scale(self):
        return self._Y_scale

    @property
    def num_features(self):
        return self._num_features

    @property
    def has_mock_md(self):
        return self._md.is_mock

    @property
    def output_path(self):
        return self._output_path

    @output_path.setter
    def output_path(self, path):
        self._output_path = path

    @property
    def training_path(self):
        return self._training_path

    # -- dataset persistence ------------------------------------------------
    def get_readme_list_local(self):
        """Load README metadata of all datasets under the training path."""
        ds_list = list(dt.iter_datasets_in_base_uri(self.training_path))
        readme_list = [_yaml.safe_load(ds.get_readme_content())
                       for ds in ds_list]
        readme_list = [rm for rm in readme_list if rm and "X" in rm]

        echo(f"Loading {len(readme_list)} local datasets "
              f"in '{self.training_path}'.")
        for ds in ds_list:
            echo(f"- {ds.uuid} ({ds.name})")
        return readme_list

    def get_readme_list_remote(self, query=None, lookup_url=None,
                               token=None):
        """Load dataset metadata from a dtool lookup server (dserver).

        POSTs a MongoDB-style query to ``{lookup_url}/lookup-datasets`` and
        loads the README content of each returned dataset.  ``file://``
        URIs are read through the local dataset layer; other protocols are
        fetched over HTTP.  Parity: reference GaPFlow/db.py:212-235.
        """
        import json
        import urllib.request

        lookup_url = lookup_url or self._db.get("dserver_url")
        if not lookup_url:
            raise RuntimeError(
                "no lookup server configured (set db.dserver_url)")

        query = query or {"readme.description": {"$regex": "Dummy"}}

        req = urllib.request.Request(
            lookup_url.rstrip("/") + "/lookup-datasets",
            data=json.dumps(query).encode(),
            headers={"Content-Type": "application/json",
                     **({"Authorization": f"Bearer {token}"} if token else {})},
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            ds_list = json.loads(resp.read())

        readme_list = []
        for ds in ds_list:
            uri = ds.get("uri", "")
            if uri.startswith("file://"):
                readme_list.append(_yaml.safe_load(
                    dt.FrozenDataset(uri[len("file://"):])
                    .get_readme_content()))
            else:
                with urllib.request.urlopen(
                        uri.rstrip("/") + "/README.yml", timeout=30) as r:
                    readme_list.append(_yaml.safe_load(r.read()))
        return [rm for rm in readme_list if rm and "X" in rm]

    def set_training_path(self, new_path, check_temporary=False):
        """Set where MD datasets are written/read (also for the MD runner)."""
        overwrite = self._temporary_training_path if check_temporary else True
        if overwrite:
            os.makedirs(new_path, exist_ok=True)
            self._training_path = new_path
            self._md._dtool_basepath = new_path
            self._db["dtool_path"] = new_path

    def _normalizer(self, x):
        return jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-12)

    def write(self):
        if self.output_path is not None:
            jnp.save(os.path.join(self.output_path, "Xtrain.npy"), self._Xtrain)
            jnp.save(os.path.join(self.output_path, "Ytrain.npy"), self._Ytrain)
            jnp.save(os.path.join(self.output_path, "Ytrain_err.npy"),
                     self._Ytrain_err)

    # -- data management ----------------------------------------------------
    def initialize(self, Xtest, dim=1):
        """Sample initial training points around the current field state."""
        method = self._db["init_method"]
        width = self._db["init_width"]
        seed = self._db["init_seed"]
        init_size = self._db["init_size"]

        Nsample = init_size - self.size
        if Nsample <= 0:
            return

        echo(f"Database contains less than {init_size} MD runs.")
        echo(f"Generate new training data in {self.training_path}")

        Xtest = jnp.asarray(Xtest)
        if dim == 1:
            flux = jnp.mean(Xtest[:, 1])
            active = jnp.array([0, 1])
        else:
            flux = jnp.hypot(jnp.mean(Xtest[:, 1]), jnp.mean(Xtest[:, 2]))
            active = jnp.array([0, 1, 2])

        rho = jnp.mean(Xtest[:, 0])

        l_bounds = jnp.array([(1. - width) * rho, 0.5 * flux, -0.5 * flux])[active]
        u_bounds = jnp.array([(1. + width) * rho, 1.5 * flux, 0.5 * flux])[active]

        key = jr.key(seed)
        key, subkey = jr.split(key)

        if method == "rand":
            samples = _get_random_samples(subkey, Nsample, l_bounds, u_bounds)
        elif method == "lhc":
            samples = _get_lhc_samples(Nsample, l_bounds, u_bounds, seed)
        else:  # sobol
            samples = _get_sobol_samples(Nsample, l_bounds, u_bounds, seed)
            Nsample = samples.shape[0]

        key, subkey = jr.split(key)
        choice = jr.choice(subkey, Xtest.shape[0], shape=(Nsample,),
                           replace=False).tolist()

        if len(active) == 2:
            samples = jnp.hstack([samples, jnp.zeros((Nsample, 1))])

        Xnew = jnp.column_stack([samples, Xtest[choice, 3:]])
        self.add_data(Xnew)

    def add_data(self, Xnew):
        """Run the MD oracle for each new row and append the results."""
        size_before = self.size
        for X in jnp.asarray(Xnew):
            size_before += 1
            Y, Ye = self._md.run(X, size_before)

            self._Xtrain = jnp.vstack([self._Xtrain, X])
            self._Ytrain = jnp.vstack([self._Ytrain, jnp.asarray(Y)])
            self._Ytrain_err = jnp.vstack([self._Ytrain_err, jnp.asarray(Ye)])

            self._X_scale = self._normalizer(self._Xtrain)
            self._Y_scale = self._normalizer(self._Ytrain)

        self.write()


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def _get_random_samples(key, N, lo, hi):
    return jr.uniform(key, shape=(N, len(lo)),
                      minval=lo[None, :], maxval=hi[None, :])


def _get_lhc_samples(N, lo, hi, seed=None):
    # seeded: DB initialization must be reproducible run-to-run
    sampler = qmc.LatinHypercube(d=len(lo), seed=seed)
    return jnp.asarray(qmc.scale(sampler.random(n=N),
                                 np.asarray(lo), np.asarray(hi)))


def _get_sobol_samples(N, lo, hi, seed=None):
    sampler = qmc.Sobol(d=len(lo), seed=seed)
    m = int(np.log2(N))
    if 2 ** m != N:
        m = int(np.ceil(np.log2(N)))
        echo(f"Sample size should be a power of 2 for Sobol sampling. "
              f"Use Ninit={2 ** m}.")
    return jnp.asarray(qmc.scale(sampler.random_base2(m=m),
                                 np.asarray(lo), np.asarray(hi)))
