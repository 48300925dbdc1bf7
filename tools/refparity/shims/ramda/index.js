'use strict';
// Minimal ramda@0.18 shim covering EXACTLY the functions
// /root/reference/geonames.js calls (split, zipObj, pick, values,
// identity, filter, whereEq, any, flip, curry with the R.__
// placeholder). Written from the public ramda 0.18 documentation so the
// reference's own transform code can execute verbatim in this offline
// sandbox (npm registry unreachable — see REFPARITY_r13.json). These are
// generic utility semantics; every domain decision (column maps,
// filters, classification, relations) runs from the reference file
// itself, unmodified.

const __ = { '@@functional/placeholder': true };
const isPh = x => x != null && x['@@functional/placeholder'] === true;

function curryN(arity, fn, prev) {
  prev = prev || [];
  return function (...args) {
    const combined = [];
    let ai = 0;
    for (const p of prev) {
      combined.push(isPh(p) && ai < args.length ? args[ai++] : p);
    }
    while (ai < args.length) combined.push(args[ai++]);
    const concrete = combined.filter(x => !isPh(x)).length;
    if (concrete >= arity && !combined.slice(0, arity).some(isPh)) {
      return fn(...combined.filter(x => !isPh(x)));
    }
    return curryN(arity, fn, combined);
  };
}

const R = {
  __,
  curry: fn => curryN(fn.length, fn),
  identity: x => x,
  split: curryN(2, (sep, str) => str.split(sep)),
  zipObj: curryN(2, (keys, vals) => {
    const o = {};
    for (let i = 0; i < keys.length; i++) o[keys[i]] = vals[i];
    return o;
  }),
  pick: curryN(2, (names, obj) => {
    const o = {};
    for (const k of names) if (k in obj) o[k] = obj[k];
    return o;
  }),
  values: obj => Object.keys(obj).map(k => obj[k]),
  filter: curryN(2, (pred, list) => list.filter(x => pred(x))),
  whereEq: curryN(2, (spec, obj) =>
    Object.keys(spec).every(k => obj[k] === spec[k])),
  any: curryN(2, (pred, list) => list.some(x => pred(x))),
  flip: fn => curryN(2, (a, b) => fn(b, a)),
};

module.exports = R;
