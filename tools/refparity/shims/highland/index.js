'use strict';
// Minimal highland@2.5 shim covering EXACTLY the stream combinators
// /root/reference/geonames.js's transform path uses: H(streamOrArray),
// .split, .compact, .map, .filter, .flatten, .each, .nfcall, .series,
// .parallel, .errors, .done, and H.curry. Eager (whole-input) where
// highland is incremental — identical results for finite inputs; row
// functions still run one-at-a-time in input order, matching .series().
//
// SCOPE CAVEAT (recorded in REFPARITY_r13.json): real highland's
// .errors(cb) CONSUMES an error and lets the stream continue; this shim
// stops at the first error after reporting it. The crash-semantics
// assertion therefore pins that the reference's own line throws — not
// how much of the tail real highland would still process afterwards.

function readAll(src) {
  if (Array.isArray(src)) return Promise.resolve(src.slice());
  return new Promise((res, rej) => {
    const chunks = [];
    src.on('data', c => chunks.push(typeof c === 'string' ? c : c.toString('utf8')));
    src.on('end', () => res([chunks.join('')]));
    src.on('error', rej);
  });
}

class Shim {
  constructor(p) { this.p = p; }
  _next(fn) { return new Shim(this.p.then(fn)); }
  split() { return this._next(xs => xs.join('').split(/\r?\n/)); }
  compact() { return this._next(xs => xs.filter(Boolean)); }
  map(fn) { return this._next(xs => xs.map(x => fn(x))); }
  filter(fn) { return this._next(xs => xs.filter(x => fn(x))); }
  flatten() { return this._next(xs => xs.flat(Infinity)); }
  each(fn) {
    this.p = this.p.then(xs => { xs.forEach(x => fn(x)); return xs; });
    return this;
  }
  nfcall(args) {
    // each element is a (possibly curried) node-style fn awaiting
    // `...args, callback`; a SYNCHRONOUS throw inside it becomes a
    // stream error, like highland's
    return this._next(xs => xs.map(f => () => new Promise((res, rej) => {
      try { f(...args, (err, val) => (err ? rej(err) : res(val))); }
      catch (e) { rej(e); }
    })));
  }
  series() {
    return this._next(async thunks => {
      const out = [];
      for (const t of thunks) out.push(await t());
      return out;
    });
  }
  parallel(_n) {
    // the reference only uses parallel(2) for two INDEPENDENT
    // admin-code loads into disjoint dicts — scheduling-only difference
    return this.series();
  }
  errors(cb) { this._errCb = cb; return this; }
  done(cb) {
    this.p.then(() => cb(), err => {
      if (this._errCb) this._errCb(err);
      else { throw err; }
    });
  }
}

function H(src) { return new Shim(readAll(src)); }

H.curry = function (fn, ...args) {
  // highland ncurry over fn.length: partial until the arity is met
  if (args.length >= fn.length) return fn(...args);
  return (...more) => H.curry(fn, ...args.concat(more));
};

module.exports = H;
